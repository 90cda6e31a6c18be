"""Serving: WebSocket transport + streaming demo app."""
