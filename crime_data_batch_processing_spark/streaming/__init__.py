"""Structured Streaming operators (P37). Populated in Stage 5."""
