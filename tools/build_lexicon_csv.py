"""Regenerate data/sentiment_lexicon.csv from functions/lexicon_data.py.

The CSV is the artifact the DuckDB oracle reads (queries/sqlgen.py
LEXICON_CSV); the module dict is what the Spark paths use. A test
(test_sentiment.py::TestLexicon::test_csv_artifact_matches_module) pins the
two equal — rerun this script after editing BASE_VALENCES.
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from social_media_sentiment_analysis_spark.functions.lexicon_data import LEXICON  # noqa: E402


def main() -> None:
    out = (Path(__file__).resolve().parent.parent
           / "social_media_sentiment_analysis_spark" / "data"
           / "sentiment_lexicon.csv")
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["word", "valence"])
        for word, valence in sorted(LEXICON.items()):
            w.writerow([word, valence])
    print(f"wrote {len(LEXICON)} entries to {out}")


if __name__ == "__main__":
    main()
