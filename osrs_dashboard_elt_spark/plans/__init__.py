"""Config -> generated Column-expression DAGs."""

from .parse_plan import ParsedStreams, build_parse_plan

__all__ = ["ParsedStreams", "build_parse_plan"]
