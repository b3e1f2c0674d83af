"""Sources: synthetic Common-Crawl-style pages + text extraction."""
