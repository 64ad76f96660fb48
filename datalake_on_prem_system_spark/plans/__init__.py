"""Plan inspection: capture physical plans and audit them for the
scale-critical properties (pushdown, broadcast, codegen, shuffle count)."""

from .audit import audit_plan, capture_plan

__all__ = ["audit_plan", "capture_plan"]
