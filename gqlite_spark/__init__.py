"""gqlite-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of webbery/GQLite (see SURVEY.md)."""

from .executor import GQLite, StatementResult
from .session import get_spark

__version__ = "0.1.0"
__all__ = ["GQLite", "StatementResult", "get_spark", "__version__"]
