"""Drop-in library API mirroring the reference converter classes.

The reference exposes ``OpenAPIToSHACLConverter(yaml_file, base_namespace,
output_dir, external_refs, base_namespace_prefix).run()`` and
``OpenAPIToRDFConverter(yaml_file, base_namespace).run()`` (reference
shacl_converter.py:13-29, rdf_converter.py:13-24, main.py:58-68). These
wrappers keep that exact surface for single-file/driver-side use — the same
pure conversion functions run distributed via operators.extract for bulk work.

``external_refs`` is accepted for signature parity; like the reference, it
only pre-binds prefixes, and resolution works lazily without it
(shacl_converter.py:93-101, 764-776).
"""

from __future__ import annotations

import pathlib

from .convert.owl import convert_owl
from .convert.shacl import DEFAULT_PREFIX, convert_shacl
from .triplecore.turtle import serialize_turtle


def register_views(spark, sf_dir: str | None = None,
                   graph_dir: str | None = None) -> list[str]:
    """Register the engine's tables as temp views so everything is also
    reachable through ``spark.sql`` (the DataFrame/SQL charter's SQL half):

    - the driver testdata tables (region/nation/.../documents/embeddings)
      when ``sf_dir`` is given;
    - the materialized graph snapshot as ``kg_graph`` when ``graph_dir``
      (a plans.snapshot table dir) is given.

    Returns the registered view names.
    """
    names: list[str] = []
    if sf_dir:
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"]:
            p = pathlib.Path(sf_dir) / f"{t}.parquet"
            if p.exists():
                spark.read.parquet(str(p)).createOrReplaceTempView(t)
                names.append(t)
    if graph_dir:
        from .plans.snapshot import read_snapshot

        read_snapshot(spark, graph_dir).createOrReplaceTempView("kg_graph")
        names.append("kg_graph")
    return names


class OpenAPIToSHACLConverter:
    def __init__(self, yaml_file: str, base_namespace: str | None = None,
                 output_dir: str = "output", external_refs: list | None = None,
                 base_namespace_prefix: str = DEFAULT_PREFIX):
        self.yaml_file = yaml_file
        self.base_namespace = base_namespace
        self.output_dir = output_dir
        self.external_refs = external_refs or []
        self.base_namespace_prefix = base_namespace_prefix
        self.rdf_triples: set | None = None
        self.shacl_triples: set | None = None

    def convert(self) -> None:
        text = pathlib.Path(self.yaml_file).read_text(encoding="utf-8")
        conv = convert_shacl(pathlib.Path(self.yaml_file).name, text,
                             self.base_namespace, self.base_namespace_prefix)
        self.rdf_triples, self.shacl_triples = conv.rdf, conv.sh

    def save_rdf(self) -> tuple[str, str]:
        stem = pathlib.Path(self.yaml_file).stem.replace("-", "_")
        out = pathlib.Path(self.output_dir)
        (out / "rdf").mkdir(parents=True, exist_ok=True)
        (out / "shacl").mkdir(parents=True, exist_ok=True)
        rdf_path = out / "rdf" / f"{stem}_rdf.ttl"
        shacl_path = out / "shacl" / f"{stem}_shacl.ttl"
        rdf_path.write_text(serialize_turtle(self.rdf_triples), encoding="utf-8")
        shacl_path.write_text(serialize_turtle(self.shacl_triples), encoding="utf-8")
        return str(rdf_path), str(shacl_path)

    def run(self) -> tuple[str, str]:
        self.convert()
        return self.save_rdf()


class OpenAPIToRDFConverter:
    def __init__(self, yaml_file: str, base_namespace: str | None = None,
                 output_dir: str = "output"):
        self.yaml_file = yaml_file
        self.base_namespace = base_namespace or "http://example.org/rdf/"
        self.output_dir = output_dir
        self.triples: set | None = None

    def convert(self) -> None:
        text = pathlib.Path(self.yaml_file).read_text(encoding="utf-8")
        conv = convert_owl(pathlib.Path(self.yaml_file).name, text,
                           self.base_namespace)
        self.triples = conv.g

    def save_rdf(self) -> str:
        stem = pathlib.Path(self.yaml_file).stem.replace("-", "_")
        out = pathlib.Path(self.output_dir)
        out.mkdir(parents=True, exist_ok=True)
        path = out / f"{stem}.ttl"
        path.write_text(serialize_turtle(self.triples), encoding="utf-8")
        return str(path)

    def run(self) -> str:
        self.convert()
        return self.save_rdf()
