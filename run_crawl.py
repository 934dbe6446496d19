#!/usr/bin/env python3
"""spark-submit launcher for the crawl round loop.

spark-submit runs a *script file* (not a module), and the package uses
relative imports — so ship the package on --py-files and point
spark-submit at this thin launcher:

    python -m zipfile -c macocu_crawler_spark.zip macocu_crawler_spark
    spark-submit --py-files macocu_crawler_spark.zip run_crawl.py \
        --rounds 100 --workdir /shared/crawl1 --resume

Locally, `python -m macocu_crawler_spark.crawl_driver` is equivalent.
"""

from macocu_crawler_spark.crawl_driver import main

if __name__ == "__main__":
    main()
