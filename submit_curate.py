#!/usr/bin/env python
"""spark-submit driver for the curation CLI.

The package CLI (`python -m mehc_curation_spark …`) builds its own
local SparkSession; under spark-submit the session comes from the
launcher instead, so ship the package and point spark-submit here::

    python -m mehc_curation_spark package -o pkg.zip
    spark-submit --master <url> --py-files pkg.zip submit_curate.py \
        curate -i <pairs.parquet> -o <out_table> [flags…]

All subcommands and flags are identical to the module CLI
(`… curate --help`). The session helper detects spark-submit via
SPARK_SUBMIT_DEPLOY_MODE and defers master/memory to the launcher.
"""

from mehc_curation_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
