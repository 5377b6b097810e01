#!/usr/bin/env python
"""Package the engine for spark-submit --py-files (north_rule deploy path):

    python make_pyfiles.py /tmp/oddb_pkg.zip
    spark-submit --master <cluster> --py-files /tmp/oddb_pkg.zip bench.py ...
"""

import os
import sys
import zipfile

def main(out: str) -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    with zipfile.ZipFile(out, "w") as z:
        for root, dirs, files in os.walk(os.path.join(repo, "od_database_spark")):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, repo))
    print(out)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "oddb_pkg.zip")
