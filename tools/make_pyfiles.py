"""Package the engine for ``spark-submit --py-files`` (north-rule run
mode: the job ships as one zip to a multi-executor cluster).

    python tools/make_pyfiles.py        # -> dist/distributedcodesearchengine_spark.zip

The zip contains only the package's .py files (no tests, no data) and
is deterministic (fixed timestamps) so repeated builds are
byte-identical — convenient for cluster-side caching.
"""

from __future__ import annotations

import pathlib
import zipfile

FIXED_TS = (2020, 1, 1, 0, 0, 0)


def build(out_path: str | None = None) -> pathlib.Path:
    root = pathlib.Path(__file__).resolve().parents[1]
    pkg = root / "distributedcodesearchengine_spark"
    out = pathlib.Path(out_path) if out_path else (
        root / "dist" / "distributedcodesearchengine_spark.zip"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        # .py sources + the server's static GUI assets
        files = sorted(pkg.rglob("*.py")) + sorted(pkg.rglob("static/*.html"))
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(root)), date_time=FIXED_TS)
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, p.read_bytes())
    return out


if __name__ == "__main__":
    print(build())
