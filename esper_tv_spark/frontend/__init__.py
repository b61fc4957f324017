from esper_tv_spark.frontend.dsl import compile_expr, run_query
from esper_tv_spark.frontend.result_json import to_result_json

__all__ = ["compile_expr", "run_query", "to_result_json"]
