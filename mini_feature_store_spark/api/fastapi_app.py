"""Optional FastAPI wiring (reference ``api/main.py:14-34`` route-for-route).

Import-gated: the container used for driver verification has no FastAPI, so
the stdlib transport (``http_server.py``) is what tests exercise; this module
provides the drop-in equivalent when FastAPI *is* installed, sharing the
exact same service layer (no logic lives here).
"""

from __future__ import annotations

from mini_feature_store_spark.api.models import FeatureResponse
from mini_feature_store_spark.api.service import (
    ApiError,
    OfflineFeatureService,
    OnlineFeatureService,
    health,
)

try:  # pragma: no cover - fastapi absent in the verification container
    from fastapi import FastAPI, HTTPException, Query

    HAVE_FASTAPI = True
except ImportError:
    FastAPI = HTTPException = Query = None  # type: ignore
    HAVE_FASTAPI = False


def build_app(
    online: OnlineFeatureService | None = None,
    offline: OfflineFeatureService | None = None,
):  # pragma: no cover - exercised only where fastapi exists
    """FastAPI app with the reference's routes:

    - GET /features/online/{user_id}  (api/online.py:19-51)
    - GET /features/offline/{user_id}?as_of=...  (api/offline.py:52-125)
    - GET /health  (api/main.py:31-34)
    """
    if not HAVE_FASTAPI:
        raise NotImplementedError(
            "fastapi is not installed; use "
            "mini_feature_store_spark.api.http_server instead"
        )

    app = FastAPI(
        title="Feature Store API",
        version="1.0.0",
        description=(
            "Online feature serving API for real-time inference. Offline "
            "features should be accessed via Spark/SQL."
        ),
    )

    def _raise(e: ApiError):
        raise HTTPException(status_code=e.status, detail=e.detail)

    @app.get("/features/online/{user_id}", response_model=FeatureResponse)
    async def get_online_features(user_id: str):
        if online is None:
            raise HTTPException(503, "online store not configured")
        try:
            return online.get(user_id)
        except ApiError as e:
            _raise(e)

    @app.get("/features/offline/{user_id}", response_model=FeatureResponse)
    async def get_offline_features(
        user_id: str,
        as_of: str = Query(..., description="Point-in-time ISO timestamp"),
    ):
        if offline is None:
            raise HTTPException(503, "offline table not configured")
        try:
            return offline.get(user_id, as_of)
        except ApiError as e:
            _raise(e)

    @app.get("/health")
    async def health_route():
        return health()

    return app
