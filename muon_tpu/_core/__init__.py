"""Core container + multimodal analysis layer (host bookkeeping, device compute)."""
