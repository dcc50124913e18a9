"""Build the spark-submit distribution zip (north_rule: "launched with
spark-submit --py-files on multi-executor clusters").

Usage:
    python scripts/make_dist.py [out.zip]
    spark-submit --py-files dist/openapi_to_rdf_spark.zip \
        -m openapi_to_rdf_spark.cli kg --workdir ...
"""

import pathlib
import sys
import zipfile

ROOT = pathlib.Path(__file__).resolve().parents[1]


def build(out: pathlib.Path) -> int:
    out.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((ROOT / "openapi_to_rdf_spark").rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            z.write(py, py.relative_to(ROOT))
            n += 1
    return n


if __name__ == "__main__":
    out = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else \
        ROOT / "dist" / "openapi_to_rdf_spark.zip"
    n = build(out)
    print(f"{out} ({n} modules)")
