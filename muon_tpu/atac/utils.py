"""ATAC utilities (reference muon/_atac/utils.py)."""

from __future__ import annotations

import re

import pandas as pd

__all__ = ["parse_region_string"]


def parse_region_string(region: str) -> pd.DataFrame:
    """Parse ``chr1:1-2000000`` / ``chr1-1-2000000`` into a one-row
    DataFrame(Chromosome/Start/End) (reference muon/_atac/utils.py:5-11)."""
    feat_list = re.split("-|:", region)
    feature_df = pd.DataFrame(columns=["Chromosome", "Start", "End"])
    feature_df.loc[0] = feat_list
    return feature_df.astype({"Start": int, "End": int})
