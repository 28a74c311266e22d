"""Per-family query/oracle registry modules (see _shared.py header)."""
