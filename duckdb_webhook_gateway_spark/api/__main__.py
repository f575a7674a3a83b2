"""Container/process entry point: ``python -m duckdb_webhook_gateway_spark.api``.

Mirrors the reference's uvicorn launch (/root/reference/Dockerfile.backend
CMD) with the Spark-native stack: one SparkSession, one Gateway over a
persistent workdir, one blocking HTTP server.

Environment:
  WEBHOOK_GATEWAY_API_KEY   auth key (default ``default_key``)
  WEBHOOK_GATEWAY_PORT      listen port (default 8000)
  WEBHOOK_GATEWAY_WORKDIR   persistent store dir (default /app/data)
  SPARK_GRAFT_CPUS          local[] core count (default all)
"""

from __future__ import annotations

import os

from ..engine.pipeline import Gateway
from ..session import get_spark
from .server import serve


def main() -> None:
    workdir = os.environ.get("WEBHOOK_GATEWAY_WORKDIR", "/app/data")
    os.makedirs(workdir, exist_ok=True)
    spark = get_spark("webhook-gateway")
    spark.sparkContext.setLogLevel("WARN")
    gateway = Gateway(spark, workdir=workdir)
    port = int(os.environ.get("WEBHOOK_GATEWAY_PORT", "8000"))
    print(f"webhook gateway listening on :{port} (workdir={workdir})")
    serve(gateway, port=port)


if __name__ == "__main__":
    main()
