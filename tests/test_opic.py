"""OPIC crawl-frontier importance (algorithms/opic.py)."""
import pytest

from dachshund_spark.algorithms.opic import opic
from dachshund_spark.graph import LinkGraph


@pytest.mark.quick
def test_opic_rejects_bad_rounds(spark):
    g = LinkGraph(spark.createDataFrame([(0, 1)], "src long, dst long"))
    with pytest.raises(ValueError):
        opic(g, rounds=0)


def test_opic_conserves_cash_and_hand_values(spark):
    # 0 -> 1, 0 -> 2, 1 -> 2, 2 dangling
    g = LinkGraph(
        spark.createDataFrame([(0, 1), (0, 2), (1, 2)], "src long, dst long")
    )
    out = {r.node_id: r for r in opic(g, rounds=2).collect()}
    C = 100_000_000
    # round 1: hist=C each; 0 sends C/2 to 1 and 2 (no remainder);
    #          1 sends C to 2; 2 keeps C.
    # cash after r1: 0 -> 0, 1 -> C/2, 2 -> C + C/2 + C = 5C/2
    # round 2: hist += cash; 0 sends 0; 1 sends C/2 to 2; 2 keeps.
    # cash after r2: 0 -> 0, 1 -> 0, 2 -> 5C/2 + C/2 = 3C
    assert out[0].cash_e8 == 0 and out[0].history_e8 == C
    assert out[1].cash_e8 == 0 and out[1].history_e8 == C + C // 2
    assert out[2].cash_e8 == 3 * C and out[2].history_e8 == C + 5 * C // 2
    # total cash conserved exactly (remainders kept, dangling keeps all)
    assert sum(r.cash_e8 for r in out.values()) == 3 * C
    # the sink dominates the importance estimate
    imp = {k: r.importance_e8 for k, r in out.items()}
    assert imp[2] > imp[1] > imp[0]


def test_opic_remainder_is_kept(spark):
    # node 0 has od=3 and cash C: C DIV 3 leaves remainder 1 that must
    # stay with 0, not vanish (exact conservation is the oracle anchor)
    g = LinkGraph(
        spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3)], "src long, dst long"
        )
    )
    out = {r.node_id: r for r in opic(g, rounds=1).collect()}
    C = 100_000_000
    assert out[0].cash_e8 == C - 3 * (C // 3)  # == 1
    # receivers are dangling: own kept cash C + the C//3 share
    assert (
        out[1].cash_e8 == out[2].cash_e8 == out[3].cash_e8 == C + C // 3
    )
    assert sum(r.cash_e8 for r in out.values()) == 4 * C
