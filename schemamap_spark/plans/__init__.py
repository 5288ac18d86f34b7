from schemamap_spark.plans.dryrun import plan_json, explain_str, InitPlan

__all__ = ["plan_json", "explain_str", "InitPlan"]
