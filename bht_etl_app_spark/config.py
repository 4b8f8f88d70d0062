"""Mapping config: the nested dict binding physical columns to BHT
concepts (reference app.py:354-361 shape, preserved verbatim so saved
``mapping_config.json`` files from the reference app load unchanged),
plus the header-name auto-detection heuristics (app.py:38-72).

All pure driver-side metadata — column names, not data. No Spark jobs.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


def _norm(s: str) -> str:
    return str(s or "").strip().lower()


def _contains_any(s: str, keys) -> bool:
    s = _norm(s)
    return any(k in s for k in keys)


# keyword lists per concept (app.py:45-63)
RESP_ID_KEYS = ["respondent id", "resp_id", "rid", "id_responden"]
DEMO_KEYS = ["gender", "age", "usia", "region", "province", "city", "kota",
             "occupation", "job", "sec", "income"]
TOM_KEYS = ["tom", "top of mind", "top_of_mind", "first mention"]
UNAIDED_KEYS = ["unaided", "spont", "open awareness", "ua_"]
AIDED_KEYS = ["aided", "prompted", "aa_"]
EVER_USED_KEYS = ["ever used", "ever_used", "ever tried", "pernah pakai",
                  "pernah gunakan", "ever_buy"]
BUMO_KEYS = ["bumo", "most often", "main brand", "usually use", "brand utama",
             "brand yang paling sering"]
CONSIDER_KEYS = ["consider", "consideration", "consider_set", "pertimbangkan"]
CSAT_KEYS = ["satisfaction", "osat", "kepuasan"]
NPS_KEYS = ["nps", "recommend", "rekomendasi", "would you recommend"]


def guess_mapping(columns: list[str]) -> dict[str, Any]:
    """Header-name heuristics -> candidate mapping (app.py:38-72).
    Operates on column names only; pass ``df.columns``."""
    L = [_norm(c) for c in columns]
    idx = {_norm(c): c for c in columns}

    resp = next((idx[c] for c in L if _contains_any(c, RESP_ID_KEYS)), None)
    demos = [idx[c] for c in L if _contains_any(c, DEMO_KEYS)]
    tom = next((idx[c] for c in L if _contains_any(c, TOM_KEYS)), None)
    unaided = [idx[c] for c in L if _contains_any(c, UNAIDED_KEYS) and idx[c] != tom]
    aided = [idx[c] for c in L if _contains_any(c, AIDED_KEYS) and idx[c] != tom]
    ever_used = [idx[c] for c in L if _contains_any(c, EVER_USED_KEYS)]
    bumo = [idx[c] for c in L if _contains_any(c, BUMO_KEYS)]
    consider = [idx[c] for c in L if _contains_any(c, CONSIDER_KEYS)]
    csat = next((idx[c] for c in L if _contains_any(c, CSAT_KEYS)), None)
    nps = next((idx[c] for c in L if _contains_any(c, NPS_KEYS)), None)

    return {
        "respondent_id": resp,
        "demographics": demos,
        "awareness": {"tom": tom, "unaided": unaided, "aided": aided},
        "usage": {"ever_used": ever_used, "bumo": bumo, "consider": consider},
        "satisfaction": {"csat": csat},
        "nps": {"score": nps},
    }


@dataclass
class MappingConfig:
    """Typed view over the reference's config dict shape."""

    respondent_id: str | None = None
    demographics: list[str] = field(default_factory=list)
    tom: str | None = None
    unaided: list[str] = field(default_factory=list)
    aided: list[str] = field(default_factory=list)
    ever_used: list[str] = field(default_factory=list)
    bumo: list[str] = field(default_factory=list)
    consider: list[str] = field(default_factory=list)
    csat: str | None = None
    nps: str | None = None

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "MappingConfig":
        aw = d.get("awareness") or {}
        us = d.get("usage") or {}
        return cls(
            respondent_id=d.get("respondent_id"),
            demographics=list(d.get("demographics") or []),
            tom=aw.get("tom"),
            unaided=list(aw.get("unaided") or []),
            aided=list(aw.get("aided") or []),
            ever_used=list(us.get("ever_used") or []),
            bumo=list(us.get("bumo") or []),
            consider=list(us.get("consider") or []),
            csat=(d.get("satisfaction") or {}).get("csat"),
            nps=(d.get("nps") or {}).get("score"),
        )

    def to_dict(self) -> dict[str, Any]:
        return {
            "respondent_id": self.respondent_id,
            "demographics": self.demographics,
            "awareness": {"tom": self.tom, "unaided": self.unaided, "aided": self.aided},
            "usage": {"ever_used": self.ever_used, "bumo": self.bumo, "consider": self.consider},
            "satisfaction": {"csat": self.csat},
            "nps": {"score": self.nps},
        }

    @classmethod
    def load(cls, path: str) -> "MappingConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def guess(cls, columns: list[str]) -> "MappingConfig":
        return cls.from_dict(guess_mapping(columns))
