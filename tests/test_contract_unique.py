"""Guard against silently-shadowed contract entries.

Round-3 verdict found a duplicated ``"stratified_sample"`` key in both the
``queries()`` dict literal and a twice-defined ``_q_stratified_sample`` at
module scope — Python keeps the LAST binding, so one query silently vanished
from the contract.  A dict literal can't detect this at runtime; parse the
source with ``ast`` and assert uniqueness structurally.
"""
import ast
import collections
import os

import pytest

ENTRY = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")


def _module():
    with open(ENTRY) as fh:
        return ast.parse(fh.read())


def _queries_keys(tree):
    """String keys of every dict literal inside the top-level queries()."""
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == "queries":
            return [
                k.value
                for sub in ast.walk(node)
                if isinstance(sub, ast.Dict)
                for k in sub.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            ]
    return []


def _oracle_keys(tree):
    """oracle_sql() returns dict(_ORACLES); collect keys from the _ORACLES
    dict literal, _ORACLES.update({...}) calls, and _ORACLES["k"] = ...
    subscript assignments at module scope.  Subscript re-assignment of an
    existing key is an intentional override only if it never happens —
    count every binding site so duplicates surface."""
    keys = []
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if (
                    isinstance(t, ast.Name)
                    and t.id == "_ORACLES"
                    and isinstance(node.value, ast.Dict)
                ):
                    keys += [
                        k.value
                        for k in node.value.keys
                        if isinstance(k, ast.Constant) and isinstance(k.value, str)
                    ]
                if (
                    isinstance(t, ast.Subscript)
                    and isinstance(t.value, ast.Name)
                    and t.value.id == "_ORACLES"
                    and isinstance(t.slice, ast.Constant)
                    and isinstance(t.slice.value, str)
                ):
                    keys.append(t.slice.value)
        if isinstance(node, ast.AnnAssign):
            t = node.target
            if (
                isinstance(t, ast.Name)
                and t.id == "_ORACLES"
                and isinstance(node.value, ast.Dict)
            ):
                keys += [
                    k.value
                    for k in node.value.keys
                    if isinstance(k, ast.Constant) and isinstance(k.value, str)
                ]
        if (
            isinstance(node, ast.Expr)
            and isinstance(node.value, ast.Call)
            and isinstance(node.value.func, ast.Attribute)
            and node.value.func.attr == "update"
            and isinstance(node.value.func.value, ast.Name)
            and node.value.func.value.id == "_ORACLES"
        ):
            for arg in node.value.args:
                if isinstance(arg, ast.Dict):
                    keys += [
                        k.value
                        for k in arg.keys
                        if isinstance(k, ast.Constant) and isinstance(k.value, str)
                    ]
    return keys


@pytest.mark.quick
def test_queries_dict_keys_unique():
    keys = _queries_keys(_module())
    assert keys, "queries() dict not found"
    dupes = [k for k, n in collections.Counter(keys).items() if n > 1]
    assert not dupes, f"duplicate queries() keys shadow earlier entries: {dupes}"


@pytest.mark.quick
def test_oracle_dict_keys_unique():
    keys = _oracle_keys(_module())
    assert keys, "_ORACLES bindings not found"
    dupes = [k for k, n in collections.Counter(keys).items() if n > 1]
    assert not dupes, f"duplicate oracle keys shadow earlier entries: {dupes}"


@pytest.mark.quick
def test_module_level_function_names_unique():
    tree = _module()
    names = [n.name for n in tree.body if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]
    dupes = [k for k, n in collections.Counter(names).items() if n > 1]
    assert not dupes, f"module-level function redefinitions shadow earlier ones: {dupes}"


@pytest.mark.quick
def test_module_level_sql_constants_unique():
    tree = _module()
    names = []
    for n in tree.body:
        if isinstance(n, ast.Assign):
            for t in n.targets:
                if isinstance(t, ast.Name) and (t.id.endswith("_SQL") or t.id.startswith("_q_")):
                    names.append(t.id)
    dupes = [k for k, c in collections.Counter(names).items() if c > 1]
    assert not dupes, f"module-level SQL constants redefined: {dupes}"
