from .parser import Node, parse_html
from .extract import (
    extract_images,
    extract_links,
    extract_text,
    extract_page,
    is_valid_image_url,
    is_image_page_url,
)

__all__ = [
    "Node",
    "parse_html",
    "extract_images",
    "extract_links",
    "extract_text",
    "extract_page",
    "is_valid_image_url",
    "is_image_page_url",
]
