"""Build the ``--py-files`` deployment zip + driver script.

    python -m smse_backend_spark.zipdist dist/

writes ``dist/smse_backend_spark.zip`` (the package, importable on every
executor) and ``dist/cli.py`` (the driver script to pass to spark-submit).
"""

from __future__ import annotations

import shutil
import sys
import zipfile
from pathlib import Path


def build(dist_dir: str) -> tuple[str, str]:
    pkg = Path(__file__).resolve().parent
    dist = Path(dist_dir)
    dist.mkdir(parents=True, exist_ok=True)
    zip_path = dist / "smse_backend_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(pkg.rglob("*.py")):
            zf.write(f, arcname=str(Path(pkg.name) / f.relative_to(pkg)))
    driver = dist / "cli.py"
    shutil.copy(pkg / "cli.py", driver)
    return str(zip_path), str(driver)


if __name__ == "__main__":
    z, d = build(sys.argv[1] if len(sys.argv) > 1 else "dist")
    print(z)
    print(d)
