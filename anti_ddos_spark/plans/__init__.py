"""Physical-plan introspection (plan-regression guardrails)."""

from anti_ddos_spark.plans.introspect import plan_summary  # noqa: F401
