#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/osm_pbf_convert_spark.zip
python -c "
import zipfile, os
with zipfile.ZipFile('dist/osm_pbf_convert_spark.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk('osm_pbf_convert_spark'):
        if '__pycache__' in root:
            continue
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('dist/osm_pbf_convert_spark.zip written')
"
