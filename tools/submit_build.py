"""spark-submit entry point: build the inverted index over an input
parquet table and print one JSON line of build stats.

    spark-submit [--master ...] --py-files dist/elasticsearch_spark.zip \\
        tools/submit_build.py <input_parquet> <index_dir> [lang]

The engine package arrives via --py-files (no repo checkout needed on
executors); this script only imports it and wires arguments — the
north-rule's ship shape for a multi-executor cluster.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    input_parquet, index_dir = sys.argv[1], sys.argv[2]
    lang = sys.argv[3] if len(sys.argv) > 3 else "en"

    spark = SparkSession.builder.appName("es-spark-index-build").getOrCreate()
    from elasticsearch_spark.operators.build import IndexBuilder, IndexConfig

    builder = IndexBuilder(spark, index_dir, IndexConfig(lang=lang or None))
    manifest = builder.build(spark.read.parquet(input_parquet))
    print(json.dumps({"stats": manifest.get("stats"), "segments": len(manifest["segments"])}))
    spark.stop()


if __name__ == "__main__":
    main()
