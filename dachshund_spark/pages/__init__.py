from dachshund_spark.pages.extract import (
    extract_hrefs,
    host_edges,
    host_of,
    extract_text,
    pages_to_edges,
    url_to_node_id,
)
from dachshund_spark.pages.generator import generate_pages, node_url

__all__ = [
    "generate_pages",
    "host_edges",
    "host_of",
    "node_url",
    "extract_text",
    "extract_hrefs",
    "pages_to_edges",
    "url_to_node_id",
]
