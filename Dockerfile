# Container packaging for the PySpark analytics engine — the parity
# surface for the reference's Dockerfile/docker-compose (which ships a
# pandas pipeline + Streamlit UI; here one image runs the whole Spark
# pipeline via `cli.py all` and emits the static HTML report instead
# of a dashboard server, so no port and no long-running process).
#
# NOTE: this build is documented-but-unverified in the development
# sandbox (no Docker daemon); the image follows the stock
# python-slim + headless-JRE pattern for single-node PySpark.

FROM python:3.12-slim

# Spark needs a JVM; headless JRE keeps the layer small.
RUN apt-get update && \
    apt-get install -y --no-install-recommends openjdk-17-jre-headless && \
    apt-get clean && rm -rf /var/lib/apt/lists/*

ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64
ENV PYTHONUNBUFFERED=1

WORKDIR /app

# Pinned to the versions the test suite runs against.
RUN pip install --no-cache-dir \
    "pyspark==4.1.2" pyarrow pandas numpy openpyxl

COPY smart_energy_consumption_analytics_using_big_data_spark/ /app/smart_energy_consumption_analytics_using_big_data_spark/

# Inputs mount at /data (readings CSVs + tariffs), outputs land in
# /out (pipeline parquet stages, model metadata, report.html).
VOLUME ["/data", "/out"]

ENTRYPOINT ["python", "-m", "smart_energy_consumption_analytics_using_big_data_spark.cli"]
CMD ["all", \
     "--readings", "/data/readings", \
     "--tariffs", "/data/tariffs.csv", \
     "--out", "/out", \
     "--test-cutoff", "2013-02-20", \
     "--val-cutoff", "2013-02-10", \
     "--html", "/out/report.html"]
