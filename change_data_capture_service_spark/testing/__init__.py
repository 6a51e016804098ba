"""Shippable test doubles (stdlib only, no pytest dependency).

Lives in the package -- not under ``tests/`` -- so examples and user code
can exercise sinks against an in-process endpoint from an installed wheel
or a trimmed checkout (``tests/`` is not shipped)."""

from change_data_capture_service_spark.testing.es_mock import MockEs

__all__ = ["MockEs"]
