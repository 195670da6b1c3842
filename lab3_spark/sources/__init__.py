from lab3_spark.sources.tables import TABLES, load_tables, register_tables
from lab3_spark.sources.text import read_text_lines

__all__ = ["TABLES", "load_tables", "register_tables", "read_text_lines"]
