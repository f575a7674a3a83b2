# Deployment parity with the reference's two-container stack
# (/root/reference/Dockerfile.backend + Dockerfile.frontend + nginx).
# This engine serves the API and the built-in UI from ONE process
# (api/server.py's GET catch-all serves frontend/build), so a single
# image suffices; pyspark brings its own embedded Spark in local mode.
FROM python:3.11-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

RUN pip install --no-cache-dir pyspark==4.1.2 pyarrow pandas numpy

WORKDIR /app
COPY duckdb_webhook_gateway_spark ./duckdb_webhook_gateway_spark
COPY frontend ./frontend

ENV PYTHONUNBUFFERED=1 \
    WEBHOOK_GATEWAY_WORKDIR=/app/data \
    WEBHOOK_GATEWAY_PORT=8000

EXPOSE 8000
VOLUME /app/data

CMD ["python", "-m", "duckdb_webhook_gateway_spark.api"]
