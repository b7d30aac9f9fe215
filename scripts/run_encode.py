#!/usr/bin/env python
"""spark-submit launcher (relative imports require the package on the
PYTHONPATH, which --py-files provides):

    spark-submit --py-files dist/crumble_spark.zip scripts/run_encode.py \
        --input <tokens-parquet> --output <dir> [--preset 9] [--direct]
"""

from crumble_spark.job import main

if __name__ == "__main__":
    main()
