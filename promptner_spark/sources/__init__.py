"""Scan-side adapters: corpus synthesis, text extraction, IOB2 gold I/O."""
