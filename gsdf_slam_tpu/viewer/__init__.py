"""Viewers (web replacement for the reference's ImGui viewer)."""

from .web_viewer import ViewerServer  # noqa: F401
