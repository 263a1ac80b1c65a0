"""Transcode-once bench card: a resumed chip-pipeline run decodes ZERO
already-checkpointed JP2 sources (the structural answer to 100 TB of
Sentinel-2 JP2 — scan-side decode cost is paid once per committed
granule-set, verified here by a Spark accumulator on the decode site and
by the wall-clock of the resume pass).

Writes BENCH/transcode_once.json. Run: python scripts/bench_transcode_once.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instageo_e2e_geospatial_ml_spark import synth  # noqa: E402
from instageo_e2e_geospatial_ml_spark.plans.pipeline import (  # noqa: E402
    ChipPipelineConfig,
    run_chip_pipeline,
)
from instageo_e2e_geospatial_ml_spark.session import get_spark  # noqa: E402
from instageo_e2e_geospatial_ml_spark.sources.checkpoint import (  # noqa: E402
    CheckpointTable,
)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    tiles = ["38PMB", "30RYS", "39QTT"]
    root = "/tmp/spark_graft_transcode_once"
    shutil.rmtree(root, ignore_errors=True)
    try:
        obs = synth.gen_observations_pdf(
            n_extra_per_tile=60, tiles=tiles, spread=0.25
        ).drop(columns=["mgrs_tile_id"])
        cat = synth.gen_granule_catalog_pdf(tiles=tiles, days=60, every=5)
        imgs = synth.gen_images_df(
            spark, list(cat["granule_id"]), w=256, h=256, fmt="jp2",
            num_partitions=cpus,
        )
        imgs.write.mode("overwrite").parquet(f"{root}/images")
        images = spark.read.parquet(f"{root}/images")
        n_images = images.count()
        cfg = ChipPipelineConfig(
            min_count=1, num_steps=1, temporal_tolerance=10, chip_size=64,
            window_size=1, mask_types=("cloud", "water"), masking_strategy="each",
        )
        ckpt = CheckpointTable(
            spark, f"{root}/chips", key="stac_items_str", partition_by="tile_key"
        )

        def one_pass():
            acc = spark.sparkContext.accumulator(0)
            t0 = time.time()
            n = run_chip_pipeline(
                spark.createDataFrame(obs), spark.createDataFrame(cat), images,
                cfg, checkpoint=ckpt, decode_counter=acc,
            ).count()
            return round(time.time() - t0, 3), acc.value, n

        w1, d1, n1 = one_pass()
        w2, d2, n2 = one_pass()
        card = {
            "card": "transcode_once",
            "n_jp2_images_256px": n_images,
            "first_pass": {"wall_s": w1, "jp2_decodes": d1, "chips": n1},
            "resume_pass": {"wall_s": w2, "jp2_decodes": d2, "chips": n2},
            "guarantee": (
                "resume decodes ZERO committed sources (accumulator on the "
                "decode call site); resume wall is checkpoint-read + "
                "anti-join only"
            ),
            "pass": bool(d2 == 0 and d1 > 0 and n1 == n2),
        }
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/transcode_once.json", "w") as fh:
            json.dump(card, fh, indent=1)
        print(json.dumps(card))
    finally:
        spark.stop()
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
