"""``python -m pg_iui_ner_api_spark`` — local form of the spark-submit
entrypoint (see cli.py)."""

import sys

from .cli import main

main(sys.argv[1:])
