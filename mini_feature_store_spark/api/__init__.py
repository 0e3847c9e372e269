"""Feature-serving API (reference ``api/`` re-expressed).

Layering (framework-free core, thin transports):

- ``models``   — the wire contract (``FeatureResponse``), mirrors
  reference ``api/models.py:5-11``.
- ``service``  — transport-agnostic handlers: online KV lookup
  (reference ``api/online.py:19-51``) and offline latest-≤-as_of lookup
  (reference ``api/offline.py:52-125``), raising typed ``ApiError``s that
  transports map to HTTP status codes.
- ``http_server`` — stdlib ``http.server`` transport (runs anywhere, no
  third-party web framework needed; used by tests and the CLI).
- ``fastapi_app`` — optional FastAPI wiring matching the reference's
  route shapes exactly (gated import; reference ``api/main.py:14-28``).
"""

from mini_feature_store_spark.api.models import FeatureResponse
from mini_feature_store_spark.api.service import (
    ApiError,
    OfflineFeatureService,
    OnlineFeatureService,
)

__all__ = [
    "ApiError",
    "FeatureResponse",
    "OfflineFeatureService",
    "OnlineFeatureService",
]
