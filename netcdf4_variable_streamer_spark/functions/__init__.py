"""Reusable column functions + gated multimodal codec stubs."""
