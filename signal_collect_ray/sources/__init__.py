from signal_collect_ray.sources.pages import (
    synthesize_pages_dataset,
    page_links,
    page_url,
)
from signal_collect_ray.sources.corpus import (
    read_jsonl_docs,
    read_warc_lite,
    write_warc_lite,
    rmat_edges,
)
from signal_collect_ray.sources.extract import (
    HYPERLINK_RE,
    extract_links,
    extract_text,
    LinkExtractor,
    TextExtractor,
    pages_to_edges,
)

__all__ = [
    "synthesize_pages_dataset",
    "page_links",
    "page_url",
    "HYPERLINK_RE",
    "extract_links",
    "extract_text",
    "LinkExtractor",
    "TextExtractor",
    "pages_to_edges",
    "read_jsonl_docs",
    "read_warc_lite",
    "write_warc_lite",
    "rmat_edges",
]
