"""Fit DEFAULT_WEIGHTS for the pairwise scorer on the synthetic gold standard.

Usage: python scripts/calibrate.py [n_pages] [seed]
Prints the fitted weight dict; paste into operators/scoring.py DEFAULT_WEIGHTS.
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from productbert_intermediate_spark.operators import scoring as S
from productbert_intermediate_spark.operators.extract import extract_offers
from productbert_intermediate_spark.session import get_spark
from productbert_intermediate_spark.synth.generator import write_fixtures


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    spark = get_spark("calibrate", cores=8)
    with tempfile.TemporaryDirectory() as d:
        paths = write_fixtures(d, n_pages=n_pages, seed=seed)
        offers = extract_offers(spark.read.parquet(paths["pages"])).where(
            "id is not null"
        )
        labeled = spark.read.parquet(paths["labeled_pairs_gs"])
        pairs = labeled.select(
            F.col("id_left").alias("id_l"),
            F.col("id_right").alias("id_r"),
            "label",
        )
        feats = S.pair_features(
            S.hydrate_pairs(pairs, offers, broadcast_offers=True)
        )
        pdf = feats.select(*S.FEATURES, "label").toPandas()
        w = S.fit_calibration(pdf, pdf["label"])
        import numpy as np

        X = pdf[list(S.FEATURES)].to_numpy()
        y = pdf["label"].to_numpy()
        logit = w["bias"] + X @ np.array([w[f] for f in S.FEATURES])
        pred = 1 / (1 + np.exp(-logit)) > 0.5
        print(f"train accuracy: {(pred == y).mean():.4f} on {len(y)} pairs")
        print("DEFAULT_WEIGHTS = {")
        for k, v in w.items():
            print(f'    "{k}": {v:.6f},')
        print("}")
    spark.stop()


if __name__ == "__main__":
    main()
