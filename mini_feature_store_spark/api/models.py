"""Wire contract for the feature serving API.

Mirrors the reference's ``api/models.py:5-11`` field-for-field so a client
of the reference can point at this service unchanged.
"""

from __future__ import annotations

from pydantic import BaseModel


class FeatureResponse(BaseModel):
    """Feature response model (reference api/models.py:5-11)."""

    user_id: str
    as_of: str
    features: dict
    source: str  # "online" or "offline"
