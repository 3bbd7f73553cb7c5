"""Engine operators: sessionization, funnels, dedup, similarity, DQ, multimodal."""

from .sessionize import sessionize, session_stats  # noqa: F401
from .funnel import funnel_counts  # noqa: F401
from .quality import Check, compile_checks, run_checks, DQReport  # noqa: F401
