"""End-to-end job graphs."""
