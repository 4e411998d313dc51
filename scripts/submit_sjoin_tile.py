"""spark-submit driver for the sjoin+tile job.

The application file itself must live OUTSIDE the --py-files zip (it is
shipped separately by spark-submit); everything else imports from the
zip:

    python scripts/package.py
    spark-submit --master <cluster-or-local[N]> \
        --py-files dist/cdap_geo_spark.zip \
        scripts/submit_sjoin_tile.py \
        --docs ... --regions ... --out ...
"""

import sys

from cdap_geo_spark.jobs.sjoin_tile import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
