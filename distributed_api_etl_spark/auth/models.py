"""Token value object (reference parity: src/auth/token/models.py)."""

from __future__ import annotations

import time
from dataclasses import dataclass


@dataclass(frozen=True)
class Token:
    token_value: str
    expires_at: float  # epoch seconds; 0 => never expires

    def is_expired(self, margin: float = 0.0) -> bool:
        if self.expires_at <= 0:
            return False
        return time.time() >= self.expires_at - margin

    def to_json(self) -> dict:
        return {"token_value": self.token_value, "expires_at": self.expires_at}

    @classmethod
    def from_json(cls, data: dict) -> "Token":
        return cls(token_value=data["token_value"], expires_at=float(data["expires_at"]))
