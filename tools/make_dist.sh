#!/usr/bin/env bash
# Build dist/who_focus_crawler_spark.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/who_focus_crawler_spark.zip
# prune caches so the zip is hermetic
find who_focus_crawler_spark -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
python -c "
import zipfile, pathlib
z = zipfile.ZipFile('dist/who_focus_crawler_spark.zip', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('who_focus_crawler_spark').rglob('*.py')):
    z.write(p, p.as_posix())
z.close()
print('dist/who_focus_crawler_spark.zip:', len(z.namelist()), 'files')
"
