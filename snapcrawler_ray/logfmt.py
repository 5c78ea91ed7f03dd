"""Compact live-stats formatting (rebuild of A5,
utils/log_formatter.py:10-118).

The reference keeps a mutable counter object and reprints one
carriage-returned status line; here the same compact line is a pure
function of the engine's metrics (counters come from round summaries /
the image pipeline verdict table), so any driver loop can render it
per round without shared mutable state.  Field semantics and the
short-URL truncation rules match the reference exactly (labels are
English equivalents of its Russian strings).
"""

from __future__ import annotations

import os
from urllib.parse import urlparse


class CompactStatsFormatter:
    """Counter set + one-line formatter (log_formatter.py:10-54)."""

    def __init__(self):
        self.reset_stats()

    def reset_stats(self) -> None:
        self.pages_found = 0
        self.images_found = 0
        self.images_failed = 0
        self.images_downloaded = 0
        self.images_saved = 0
        self.folder_size_mb = 0.0
        self.has_errors = False
        self.error_code = None
        self.last_update_line = ""

    def update_stats(self, **kwargs) -> None:
        for key, value in kwargs.items():
            if hasattr(self, key):
                setattr(self, key, value)

    def format_compact_line(self) -> str:
        error_status = (
            f"Errors: {self.error_code}" if self.has_errors else "Errors: none"
        )
        return (
            f"Pages: {self.pages_found} | "
            f"Found: {self.images_found} | "
            f"Rejected: {self.images_failed} | "
            f"Downloaded: {self.images_downloaded} | "
            f"Saved: {self.images_saved} | "
            f"Folder: {self.folder_size_mb:.1f}MB | "
            f"{error_status}"
        )

    def print_update(self) -> None:
        """Reprint-in-place only when the line changed
        (log_formatter.py:48-54)."""
        current = self.format_compact_line()
        if current != self.last_update_line:
            print(f"\r{' ' * 120}\r{current}", end="", flush=True)
            self.last_update_line = current


def format_url_short(url: str, max_length: int = 50) -> str:
    """Last-5-chars + extension truncation (log_formatter.py:57-89)."""
    if not url:
        return "???"
    try:
        parsed = urlparse(url)
        filename = os.path.basename(parsed.path)
        if not filename:
            domain = parsed.netloc
            return domain[-5:] if len(domain) >= 5 else domain
        name, ext = os.path.splitext(filename)
        if ext:
            short = name[-5:] if len(name) >= 5 else name
            return f"{short}{ext}"
        return filename[-5:] if len(filename) >= 5 else filename
    except Exception:
        return url[-5:] if len(url) >= 5 else url


_STATUS_MAP = {
    "loading": "[LOADING]",
    "error": "[ERROR]",
    "success": "[SUCCESS]",
    "duplicate": "[DUPLICATE]",
    "filtered": "[FILTERED]",
    "size_fail": "[SIZE]",
    "format_fail": "[FORMAT]",
    "dpi_fail": "[DPI]",
    "color_fail": "[COLOR]",
    "orientation_fail": "[ORIENTATION]",
    "aspect_fail": "[ASPECT]",
    "watermark_fail": "[WATERMARK]",
    "banner_fail": "[BANNER]",
    "captcha": "[CAPTCHA]",
    "throttle": "[THROTTLE]",
    "connection_error": "[CONNECTION]",
    "crawl_start": "[START]",
    "crawl_complete": "[COMPLETE]",
    "new_links": "[LINKS]",
    "depth_complete": "[DEPTH]",
}


def format_process_status(action: str, details: str = "") -> str:
    status = _STATUS_MAP.get(action, f"[{action.upper()}]")
    return f"{status} {details}".strip()


def stats_from_run(metrics: list[dict], reason_counts: dict | None = None,
                   bytes_written: int = 0) -> CompactStatsFormatter:
    """Build the formatter from engine round metrics + the image
    pipeline's reason histogram ('' = accepted)."""
    f = CompactStatsFormatter()
    f.pages_found = int(sum(m.get("fetched", 0) for m in metrics))
    f.images_found = int(sum(m.get("images", 0) for m in metrics))
    if reason_counts:
        f.images_saved = int(reason_counts.get("", 0))
        f.images_failed = int(
            sum(v for k, v in reason_counts.items() if k != "")
        )
        f.images_downloaded = f.images_saved + f.images_failed
    f.folder_size_mb = round(bytes_written / 1_048_576, 1)
    return f
