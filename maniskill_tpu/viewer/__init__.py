"""Browser-streamed interactive viewer (TPU-host counterpart of the
reference's ``sapien.utils.Viewer``, mani_skill/utils/sapien_utils.py:442).

A Vulkan window cannot open on a headless TPU host, so the viewer is an
HTTP server instead: the human render camera streams as MJPEG to any
browser, and keyboard / mouse-drag events stream back as teleop actions.
"""
from .server import BrowserViewer

__all__ = ["BrowserViewer"]
