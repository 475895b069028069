"""Multimodal columns: image/audio/video as opaque binary + typed metadata."""
