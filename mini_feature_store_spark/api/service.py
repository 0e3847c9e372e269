"""Transport-agnostic feature-serving handlers.

Online path (reference ``api/online.py:19-51``): GET ``features:{user_id}``
from the injected KV store (FileKVStore locally, Redis in production via
``pipelines.online_sync.redis_kv_factory``), 404 when absent.

Offline path (reference ``api/offline.py:52-125``): latest row with
``day <= as_of`` for the user from the versioned features table — the same
leakage rule as the point-in-time join (``operators/point_in_time.py``,
reference ``TestPointInTimeJoin.scala:92-99``: a feature computed after the
request's as_of must never be visible). 400 on malformed as_of, 404 when the
user has no row at or before as_of. Dev/debug only, exactly like the
reference: production training data goes through the PIT join, not REST.

Deliberate deviations from the reference (documented, SURVEY.md §4.3):
- online ``as_of`` echoes an injectable clock instead of bare
  ``datetime.now()`` so responses are testable/reproducible;
- the offline scan prunes columns and pushes ``user_id``/``day`` filters
  into the parquet scan instead of collecting then filtering driver-side.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mini_feature_store_spark.api.models import FeatureResponse


class ApiError(Exception):
    """Typed service error; transports map ``status`` to the HTTP code."""

    def __init__(self, status: int, detail: str):
        super().__init__(detail)
        self.status = status
        self.detail = detail


def _utcnow_iso() -> str:
    return datetime.now(timezone.utc).replace(tzinfo=None).isoformat()


class OnlineFeatureService:
    """Low-latency KV lookup (reference api/online.py:19-51)."""

    def __init__(
        self,
        kv_store,
        key_prefix: str = "features:",
        clock: Callable[[], str] = _utcnow_iso,
    ):
        self.kv = kv_store
        self.key_prefix = key_prefix
        self.clock = clock

    def get(self, user_id: str) -> FeatureResponse:
        features = self.kv.get(f"{self.key_prefix}{user_id}")
        if features is None:
            raise ApiError(404, f"Features not found for user_id: {user_id}")
        return FeatureResponse(
            user_id=user_id,
            as_of=self.clock(),
            features=features,
            source="online",
        )


class OfflineFeatureService:
    """Point-in-time row lookup over the offline features table
    (reference api/offline.py:52-125).

    ``table_reader`` is any zero-arg callable returning the features
    DataFrame (a ``VersionedTable(...).read`` closure, a catalog table, a
    plain parquet scan) so the service itself carries no storage opinion.
    """

    def __init__(
        self,
        spark: SparkSession,
        table_reader: Callable[[SparkSession], "object"],
        user_col: str = "user_id",
        day_col: str = "day",
    ):
        self.spark = spark
        self.table_reader = table_reader
        self.user_col = user_col
        self.day_col = day_col

    def get(self, user_id: str, as_of: str) -> FeatureResponse:
        try:
            as_of_dt = datetime.fromisoformat(as_of.replace("Z", "+00:00"))
            as_of_date = as_of_dt.date()
        except ValueError:
            raise ApiError(
                400,
                f"Invalid as_of format: {as_of}. Use ISO format "
                "(e.g., '2024-01-05T12:00:00').",
            )

        df = self.table_reader(self.spark)
        # Both predicates are sargable → parquet PushedFilters; ORDER BY +
        # LIMIT 1 is a TakeOrderedAndProject, not a full sort.
        row = (
            df.where(
                (F.col(self.user_col).cast("string") == user_id)
                & (F.col(self.day_col) <= F.lit(str(as_of_date)).cast("date"))
            )
            .orderBy(F.col(self.day_col).desc())
            .limit(1)
            .collect()
        )
        if not row:
            raise ApiError(
                404, f"Features not found for user_id: {user_id} at {as_of}"
            )
        r = row[0].asDict()
        features = {
            k: (str(v) if k == self.day_col else v)
            for k, v in r.items()
            if k != self.user_col
        }
        return FeatureResponse(
            user_id=user_id, as_of=as_of, features=features, source="offline"
        )


def health() -> dict:
    """Reference api/main.py:31-34."""
    return {"status": "healthy"}
