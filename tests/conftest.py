import os
import sys
import pathlib

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REFERENCE = pathlib.Path("/root/reference")
FIXTURE_DIR = REFERENCE / "assets/MnS-Rel-19-OpenAPI/OpenAPI"
GOLDEN_RDF = REFERENCE / "output/rdf"
GOLDEN_SHACL = REFERENCE / "output/shacl"
TESTDATA = pathlib.Path(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"))


def fixture_names():
    if not FIXTURE_DIR.exists():
        return []
    return sorted(p.stem for p in FIXTURE_DIR.glob("*.yaml")
                  if (GOLDEN_RDF / f"{p.stem}_rdf.ttl").exists())


@pytest.fixture(scope="session")
def spark():
    """Session-scoped local SparkSession tuned for the 32-core sandbox."""
    from openapi_to_rdf_spark.session import get_spark

    spark = get_spark(app_name="tests", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
                      shuffle_partitions=8)
    yield spark
    spark.stop()
