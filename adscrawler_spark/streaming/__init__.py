"""Micro-batched crawl generation loop + deterministic fetch simulator."""
