"""Web server & REST/streaming API.

Behaviour-compatible with the reference surface (SURVEY §2.5): the same
routes, JSON schemas, wildcard semantics, and streaming model, implemented on
Python's threading HTTP server (the reference uses libmicrohttpd in
thread-per-connection mode, httpserver.cxx:254-276 — same concurrency model).
"""

from .routes import UrlTree
from .server import RadioHttpServer
from .audiostream import AudioStreamManager

__all__ = ["UrlTree", "RadioHttpServer", "AudioStreamManager"]
