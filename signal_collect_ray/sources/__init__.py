from signal_collect_ray.sources.pages import (
    synthesize_pages_dataset,
    page_links,
    page_url,
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
]
