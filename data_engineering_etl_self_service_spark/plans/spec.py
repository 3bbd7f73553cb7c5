"""Declarative pipeline spec — the reference's self-service YAML contract.

Same document shape as ``configs/sources/marketing_api_campaigns.yaml``
(ref :2-34): ``pipeline_info`` / ``source`` / ``destination`` /
``data_quality_checks``. The reference compiles each YAML to an Airflow DAG
(ref: dags/dag_factory.py:22-106); we compile it to a typed
:class:`PipelineSpec` and then (plans/pipeline.py) to a function over
DataFrames running in one driver program — no DAG registry, no XCom, no
metadata database.

Spec validation happens at parse time (the reference defers unknown check
types to a runtime warning, ref: operators/data_quality_operator.py:116-117;
we surface them at compile time AND keep the runtime-tolerant path).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml

from ..operators.quality import KNOWN_CHECKS

#: source kinds the compiler accepts (reference surface + engine extensions)
SOURCE_TYPES = (
    "http_api",
    "file",
    "table",
    "synthetic_events",
    "kafka",
    "snapshot_cdf",
)
SINK_TYPES = (
    "parquet",
    "json",
    "snapshot",
    "snapshot_merge",
    "rollup",
    "shards",
    "none",
)
#: declarative transformation ops (compiled to DataFrame expressions —
#: the reference has no transform stage at all; SURVEY §2.2 requires the
#: engine to expose select/filter in the self-service contract)
TRANSFORM_OPS = (
    "filter",
    "select",
    "with_column",
    "drop",
    "rename",
    "deduplicate",
    "repartition",
    "join",
    "aggregate",
    "sessionize",
    "mask",
    "drop_near_duplicates",
    "langid",
    "quality_score",
    "chunk",
    "decode_media",
    "extract_text",
    "extract_archive",
    "scrub_duplicates",
    "tokenize",
    "lm_fluency",
    "semantic_dedup",
    "temporal_join",
    "normalize_unicode",
    "classify",
)


@dataclass(frozen=True)
class SourceSpec:
    type: str
    options: dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class SinkSpec:
    type: str
    path: str | None = None
    partition_by: tuple[str, ...] = ()
    options: dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class PipelineSpec:
    name: str
    owner: str | None
    schedule: str | None
    source: SourceSpec
    destination: SinkSpec
    checks: list[dict[str, Any]]
    transformations: tuple[dict[str, Any], ...] = ()
    warnings: tuple[str, ...] = ()
    #: "batch" (reference semantics: any failure quarantines the whole
    #: landing) or "rows" (per-row checks divert only offending rows;
    #: table-level checks then gate the clean remainder).
    quality_mode: str = "batch"

    @property
    def dag_id(self) -> str:
        # parity with the reference's naming (ref: dag_factory.py:43)
        return f"dynamic_ingest_{self.name}"


def _parse(config: dict[str, Any], origin: str = "<dict>") -> PipelineSpec:
    info = config.get("pipeline_info", {})
    src = dict(config.get("source", {}))
    dst = dict(config.get("destination", {}))
    checks = list(config.get("data_quality_checks", []) or [])

    warnings: list[str] = []
    stype = src.pop("type", "http_api")
    if stype not in SOURCE_TYPES:
        warnings.append(f"{origin}: unknown source type '{stype}'")
    # reference destination shape is S3 bucket+key (yaml:23-25) → map to a
    # lake path; native shape is {type, path, partition_by}.
    if "s3_bucket" in dst or "s3_key" in dst:
        path = f"{dst.pop('s3_bucket', 'lake')}/{dst.pop('s3_key', '')}"
        sink = SinkSpec(type="parquet", path=path, partition_by=("ds",), options=dst)
    else:
        ktype = dst.pop("type", "parquet")
        if ktype not in SINK_TYPES:
            warnings.append(f"{origin}: unknown destination type '{ktype}'")
        sink = SinkSpec(
            type=ktype,
            path=dst.pop("path", None),
            partition_by=tuple(dst.pop("partition_by", ()) or ()),
            options=dst,
        )
    for c in checks:
        if c.get("check_type") not in KNOWN_CHECKS:
            warnings.append(f"{origin}: unknown check_type '{c.get('check_type')}'")
    transformations = tuple(config.get("transformations", []) or [])
    for t in transformations:
        if t.get("op") not in TRANSFORM_OPS:
            warnings.append(f"{origin}: unknown transformation op '{t.get('op')}'")
    quality_mode = config.get("data_quality_mode", "batch")
    if quality_mode not in ("batch", "rows"):
        warnings.append(
            f"{origin}: unknown data_quality_mode '{quality_mode}'"
        )
        quality_mode = "batch"

    return PipelineSpec(
        name=info.get("name", Path(origin).stem),
        owner=info.get("owner"),
        schedule=info.get("schedule"),
        source=SourceSpec(type=stype, options=src),
        destination=sink,
        checks=checks,
        transformations=transformations,
        warnings=tuple(warnings),
        quality_mode=quality_mode,
    )


def load_spec(path: str | Path) -> PipelineSpec:
    """One YAML file → PipelineSpec (ref: dag_factory.py:103-105)."""
    p = Path(path)
    with open(p) as f:
        config = yaml.safe_load(f)
    return _parse(config, origin=str(p))


def load_specs(config_dir: str | Path) -> list[PipelineSpec]:
    """Every ``*.yaml`` in a directory → specs (ref: dag_factory.py:100-106
    — the factory loop, minus the globals() DAG registration)."""
    return [load_spec(p) for p in sorted(Path(config_dir).glob("*.yaml"))]


def spec_from_dict(config: dict[str, Any]) -> PipelineSpec:
    return _parse(config)
