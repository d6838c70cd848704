"""Media-codec scale probe: per-document decode cost of the round-7
audio/video evidence pipelines as the corpus grows.

The extract paths are Arrow-batched Python codecs (the documented
tier — swap PIL/ffmpeg into the same closures at production scale), so
the claim to verify is LINEARITY: per-doc wall must stay ~flat as the
corpus amplifies, i.e. no super-linear driver or shuffle component.

Usage: python tools/media_scale.py [multipliers ...]   (default 1 4 16)
Prints one markdown row per (pipeline, corpus size) for RESULTS.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aoseventstreamer_spark.operators import multimodal as MM
from aoseventstreamer_spark.session import get_spark, load_table


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("media-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )

    pipelines = {
        "audio_meta (FLAC/MP3 headers)": lambda d: MM.extract_audio_meta(
            MM.wrap_as_audio(d)
        ),
        "audio_features (WAV+FLAC PCM decode)": lambda d: MM.extract_audio_evidence(
            MM.wrap_as_wav(d)
        ),
        "video_frames (MJPEG decode)": lambda d: MM.extract_video_frames(
            MM.wrap_as_video(d)
        ),
    }

    print("| pipeline | docs | wall | per-doc |")
    print("|---|---|---|---|")
    for name, build in pipelines.items():
        for m in mults:
            docs = base
            if m > 1:
                docs = base.crossJoin(
                    spark.range(m).select(F.col("id").alias("__rep"))
                ).select(
                    (F.col("doc_id") * m + F.col("__rep")).alias("doc_id"),
                    "text",
                )
            docs = docs.repartition(32).localCheckpoint()
            n = docs.count()
            df = build(docs)
            df.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            print(
                f"| {name} | {n} | {wall:.2f} s | {wall * 1000 / n:.2f} ms |",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
