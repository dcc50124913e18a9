"""Dev harness: run convert_shacl over all 38 reference fixtures and report
per-file P/R against the committed goldens. Not a test — tests/test_convert_golden.py
is the pytest gate; this prints diagnostics for iteration."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.convert.shacl import convert_shacl
from openapi_to_rdf_spark.triplecore.turtle import parse_turtle
from openapi_to_rdf_spark.triplecore.canon import precision_recall

REF = pathlib.Path("/root/reference")
SPECS = sorted((REF / "assets/MnS-Rel-19-OpenAPI/OpenAPI").glob("*.yaml"))


def main(only=None, verbose=False):
    worst = 1.0
    fails = 0
    for spec in SPECS:
        if only and only not in spec.name:
            continue
        stem = spec.stem
        golden_rdf = REF / "output/rdf" / f"{stem}_rdf.ttl"
        golden_sh = REF / "output/shacl" / f"{stem}_shacl.ttl"
        if not golden_rdf.exists():
            print(f"{stem}: NO GOLDEN, skipping")
            continue
        try:
            conv = convert_shacl(spec.name, spec.read_text())
        except Exception as e:
            print(f"{stem}: CONVERT ERROR {type(e).__name__}: {e}")
            fails += 1
            continue
        try:
            g_rdf = parse_turtle(golden_rdf.read_text())
            g_sh = parse_turtle(golden_sh.read_text())
        except Exception as e:
            print(f"{stem}: PARSE ERROR {type(e).__name__}: {e}")
            fails += 1
            continue
        pr_rdf = precision_recall(conv.rdf, g_rdf)
        pr_sh = precision_recall(conv.sh, g_sh)
        pmin = min(pr_rdf["precision"], pr_rdf["recall"], pr_sh["precision"], pr_sh["recall"])
        worst = min(worst, pmin)
        mark = "OK " if pmin >= 0.999999 else ("ok " if pmin >= 0.95 else "BAD")
        print(f"{mark} {stem}: rdf P={pr_rdf['precision']:.4f} R={pr_rdf['recall']:.4f} "
              f"({pr_rdf['ours']}/{pr_rdf['golden']})  "
              f"shacl P={pr_sh['precision']:.4f} R={pr_sh['recall']:.4f} "
              f"({pr_sh['ours']}/{pr_sh['golden']})")
        if pmin < 1.0 and verbose:
            for label, pr in (("rdf", pr_rdf), ("shacl", pr_sh)):
                if pr["missing"]:
                    print(f"  {label} MISSING (golden-only), first {len(pr['missing'])}:")
                    for t in pr["missing"][:8]:
                        print(f"    {t}")
                if pr["extra"]:
                    print(f"  {label} EXTRA (ours-only), first {len(pr['extra'])}:")
                    for t in pr["extra"][:8]:
                        print(f"    {t}")
    print(f"\nworst min(P,R) = {worst:.6f}, hard failures = {fails}")


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    main(only, verbose="-v" in sys.argv)
