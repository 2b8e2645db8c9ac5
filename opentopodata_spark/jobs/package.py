"""Emit the --py-files archive for spark-submit.

    python -m opentopodata_spark.jobs.package --out /tmp/otds.zip
"""

from __future__ import annotations

import argparse
import shutil
import sys

from ..session import package_zip


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="opentopodata_spark.jobs.package")
    p.add_argument("--out", default=None, help="destination zip path (default: print cache path)")
    ns = p.parse_args(argv)
    src = package_zip()
    if ns.out:
        shutil.copyfile(src, ns.out)
        print(ns.out)
    else:
        print(src)
    return 0


if __name__ == "__main__":
    sys.exit(main())
