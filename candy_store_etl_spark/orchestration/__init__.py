from .candy_dag import (
    CANDY_DAG_TASKS,
    StageContext,
    build_airflow_dag,
    run_dag,
    run_stage,
    topological_order,
)

__all__ = [
    "CANDY_DAG_TASKS",
    "StageContext",
    "build_airflow_dag",
    "run_dag",
    "run_stage",
    "topological_order",
]
