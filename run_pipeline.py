"""spark-submit driver shim for the KG pipeline.

    zip -r kgspark.zip pg_iui_ner_api_spark
    spark-submit --py-files kgspark.zip run_pipeline.py --input ... --workdir ...

All logic lives in pg_iui_ner_api_spark.cli so the shipped zip is the
single source of truth; this file only has to exist because
spark-submit takes a script path, not a module name.
"""

import sys

from pg_iui_ner_api_spark.cli import main

main(sys.argv[1:])
