"""Hint features and groups (reference include/hints.hh Feature/HintGroup).

Minimal representation sufficient for the DP bonus tracks and the evidence
reporting; the GFF hint reader populates the same structures.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class Feature:
    start: int
    end: int
    type: str                  # one of hints.config.FEATURE_TYPES
    strand: str = "."          # '+', '-', '.' (both/unknown)
    score: float = 0.0
    source: str = "M"          # source key (esource)
    bonus: float = 1.0
    malus: float = 1.0
    groupname: str = ""
    priority: int = -1
    mult: int = 1


@dataclass
class HintGroup:
    hints: List[Feature] = field(default_factory=list)
    name: str = ""

    @property
    def begin(self) -> int:
        return min(h.start for h in self.hints)

    @property
    def end(self) -> int:
        return max(h.end for h in self.hints)

    @property
    def source(self) -> str:
        return self.hints[0].source if self.hints else ""


def softmask_hints(softmask: np.ndarray, ext_cfg) -> List[HintGroup]:
    """Lowercase runs -> nonexonpart 'RM' hints, one group each
    (reference SequenceFeatureCollection::prepare, extrinsicinfo.cc:1697)."""
    groups: List[HintGroup] = []
    n = softmask.shape[0]
    pos = 0
    bonus = ext_cfg.bonus_for("nonexonpart", "RM", 0.0) if ext_cfg else 1.0
    if bonus == 1.0:
        return groups   # reference drops bonus-1 hints (extrinsicinfo.cc:1718)
    mask = np.asarray(softmask, dtype=bool)
    while pos < n:
        while pos < n and not mask[pos]:
            pos += 1
        if pos < n:
            start = pos
            end = pos
            while end + 1 < n and mask[end + 1]:
                end += 1
            f = Feature(start=start, end=end, type="nonexonpart",
                        strand=".", score=0.0, source="RM", bonus=bonus,
                        priority=-1, mult=1)
            groups.append(HintGroup(hints=[f], name=""))
            pos = end + 1
    return groups
