"""``python -m overturelink_data_pipeline_spark`` → cli.main."""

import sys

from overturelink_data_pipeline_spark.cli import main

sys.exit(main())
