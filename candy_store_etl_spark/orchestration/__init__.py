from .candy_dag import CANDY_DAG_TASKS, build_airflow_dag, topological_order

__all__ = ["CANDY_DAG_TASKS", "build_airflow_dag", "topological_order"]
