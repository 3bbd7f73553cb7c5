"""Pipeline specs: the self-service YAML contract, compiled to DataFrame stages."""

from .spec import PipelineSpec, load_spec, load_specs  # noqa: F401
from .pipeline import compile_pipeline, run_pipeline, PipelineResult  # noqa: F401
