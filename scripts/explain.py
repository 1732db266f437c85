"""Plan auditor: print the formatted physical plan of any registered
query (the judge-the-plan loop from PERFORMANCE.md).

Usage: python scripts/explain.py q_name [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark()
    df = QUERIES[name](spark, sf_dir)
    df.explain("formatted")


if __name__ == "__main__":
    main()
