from .tpch import TPCH_TABLES, load_table, load_tables, register_views
from .candy import (
    CUSTOMERS_SCHEMA,
    PRODUCTS_SCHEMA,
    TRANSACTIONS_SCHEMA,
    read_customers,
    read_products,
    read_transactions,
)

__all__ = [
    "TPCH_TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "TRANSACTIONS_SCHEMA",
    "PRODUCTS_SCHEMA",
    "CUSTOMERS_SCHEMA",
    "read_transactions",
    "read_products",
    "read_customers",
]
