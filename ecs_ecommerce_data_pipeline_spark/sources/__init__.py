from .testdata import ecommerce_views, load_table, load_tables, register_views

__all__ = ["ecommerce_views", "load_table", "load_tables", "register_views"]
