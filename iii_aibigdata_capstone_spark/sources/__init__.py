"""Custom sources.

File-format scans (CSV/text/JSON/binaryFile) live in
``operators/io_formats.py`` as oracle-checked queries; this package holds
connector *implementations* — currently the pure-Python custom DataSource
(:mod:`.synthetic`), the Spark-4 API that replaces the reference's
hand-rolled Kafka receiver decoders with an engine-managed source.
"""

from .synthetic import SyntheticEventsDataSource, register

__all__ = ["SyntheticEventsDataSource", "register"]
