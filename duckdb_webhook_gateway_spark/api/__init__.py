"""HTTP shell for the engine.

:mod:`.server` is a dependency-free stdlib implementation of the
reference's route table (SURVEY §3.4).  If FastAPI is installed in the
deployment environment, :mod:`.fastapi_app` exposes the same gateway as a
FastAPI app (import-gated; not available in this container).
"""

from .server import GatewayHTTPServer, serve

__all__ = ["GatewayHTTPServer", "serve"]
