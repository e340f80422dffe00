"""The daily crawl as ONE streaming job — all three bridge families.

    python examples/daily_crawl.py [sf_dir]

A training-data pipeline's daily loop is probe → keep → assimilate: new
crawl batches are checked against everything already ingested, the
non-duplicates join the corpus, and tomorrow's batch must see them.
This script runs that loop as Structured Streaming jobs
(streaming/assimilate.py) at all three index families:

    TEXT    crawl-day jsonl of documents  →  minhash band-index probe
            →  verdicts parquet  →  keeps append-merged
    MEDIA   crawl-day jsonl of image payloads  →  dHash signature-index
            probe  →  verdicts parquet  →  keeps append-merged
    VECTORS crawl-day jsonl of embeddings  →  IVFPQ top-k search (the
            nearest-neighbor context attached at ingest)  →  the WHOLE
            batch assimilated on the frozen codebook/centroids

Each bridge is restart-safe: verdict/neighbor rows overwrite per-day
directories (replay rewrites identical rows), the index chain persists
to a manifest (a replayed day probes its original pre-state), and a
source checkpoint resumes the backlog position.  Day 2 of each demo
contains retransmits of day 1's keeps — caught ONLY because day 1 was
assimilated between micro-batches.
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mycenae_spark.session import get_spark  # noqa: E402


def main() -> None:  # noqa: PLR0915 — a linear three-act demo script
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("daily-crawl-example")
    spark.sparkContext.setLogLevel("ERROR")

    import pyspark.sql.functions as F

    from mycenae_spark.functions import pq
    from mycenae_spark.functions.dedup import (
        ensure_band_index,
        ensure_sig_index,
    )
    from mycenae_spark.functions.multimodal import (
        MEDIA_CORPUS_VERSION,
        _GRAY_PALETTE,
        dhash_media,
        encode_gif,
        encode_png,
        pixel_corpus_image,
    )
    from mycenae_spark.registry.util import r6
    from mycenae_spark.sources.tables import load_table
    from mycenae_spark.streaming.assimilate import (
        ANN_RESULT_SCHEMA,
        TEXT_VERDICT_SCHEMA,
        VERDICT_SCHEMA,
        ann_assimilate_stream,
        media_assimilate_stream,
        read_bridge_output,
        text_assimilate_stream,
        write_day_files,
    )

    work = tempfile.mkdtemp(prefix="daily_crawl_")
    # a private index root: act 4 runs the GC with a demo clock
    # (max_age_s=0), which must not sweep the machine's shared cache
    os.environ["MYCENAE_INDEX_ROOT"] = os.path.join(work, "index_root")
    try:
        # ----------------------------------------------------- 1. TEXT
        def text(i):
            return f"doc {i} token stream " + " ".join(
                f"w{i}p{j}" for j in range(12)
            )

        t_base = ensure_band_index(
            spark, sf_dir,
            spark.createDataFrame([(i, text(i)) for i in range(10)],
                                  "doc_id long, text string"),
            "doc_id", "text", pred_desc="daily-crawl-demo",
            n_bands=4, max_bucket_size=512,
        )
        t_src, t_out = os.path.join(work, "t_src"), os.path.join(work, "t_out")
        write_day_files(t_src, [
            ("day1.jsonl",
             [json.dumps({"doc_id": 1000, "day": 1, "text": text(0)})] +
             [json.dumps({"doc_id": 1000 + i, "day": 1, "text": text(i)})
              for i in (10, 11)]),
            ("day2.jsonl",
             [json.dumps({"doc_id": 2010, "day": 2, "text": text(10)}),
              json.dumps({"doc_id": 2012, "day": 2, "text": text(12)})]),
        ])
        chain = text_assimilate_stream(spark, t_src, t_base, t_out)
        v = read_bridge_output(spark, t_out, TEXT_VERDICT_SCHEMA)
        caught = v.filter("doc_id = 2010").collect()[0]
        print(f"TEXT    {len(chain)} generations; retransmit 2010 -> "
              f"dup_of={caught['dup_of']} (a day-1 keep)")

        # ---------------------------------------------------- 2. MEDIA
        def png(d):
            _w, _h, ct, _g, px = pixel_corpus_image(d)
            return encode_png(px, ct, row_filters=lambda y: y % 5, n_idat=2)

        def gif(d):
            _w, _h, _ct, g, _px = pixel_corpus_image(d)
            return encode_gif(g, _GRAY_PALETTE)

        m_base = ensure_sig_index(
            spark, sf_dir,
            dhash_media(
                spark.createDataFrame(
                    [(d, bytearray(png(d))) for d in range(6)],
                    "media_id long, payload binary"),
                max_batch_bytes=1 << 20,
            ).select("media_id", "dhash"),
            "media_id", "dhash", pred_desc="daily-crawl-demo",
            kind="dhash-demo", bits=64, n_segments=6, max_bucket_size=512,
            source_version=MEDIA_CORPUS_VERSION,
        )

        def mrow(mid, day, payload):
            return json.dumps({"media_id": mid, "day": day,
                               "payload_b64":
                               base64.b64encode(payload).decode()})

        m_src, m_out = os.path.join(work, "m_src"), os.path.join(work, "m_out")
        write_day_files(m_src, [
            ("day1.jsonl", [mrow(1000 + d, 1, png(d)) for d in (6, 7, 8)]),
            # day 2 retransmits a day-1 keep RE-ENCODED as GIF: different
            # bytes, same pixels — only the signature index catches it
            ("day2.jsonl", [mrow(2000, 2, gif(6)), mrow(2001, 2, png(9))]),
        ])
        chain = media_assimilate_stream(spark, m_src, m_base, m_out)
        v = read_bridge_output(spark, m_out, VERDICT_SCHEMA)
        caught = v.filter("media_id = 2000").collect()[0]
        print(f"MEDIA   {len(chain)} generations; GIF re-encode 2000 -> "
              f"dup_of={caught['dup_of']} (a day-1 PNG keep)")

        # -------------------------------------------------- 3. VECTORS
        e = load_table(spark, sf_dir, "embeddings")
        base_pred = ~((F.col("vec_id") % 20).isin(2, 3))
        a_base = pq.ensure_ivfpq_index(
            spark, sf_dir, rounder=r6, pred=base_pred, pred_desc="mod20ne23"
        )
        a_src, a_out = os.path.join(work, "a_src"), os.path.join(work, "a_out")
        files = []
        for day, mod in ((1, 2), (2, 3)):
            rows = (e.filter((F.col("vec_id") % 20 == mod)
                             & (F.col("vec_id") < 500))
                    .select("vec_id", "embedding").collect())
            files.append((f"day{day}.jsonl", [
                json.dumps({"vec_id": r["vec_id"], "day": day,
                            "embedding": list(r["embedding"])})
                for r in rows
            ]))
        write_day_files(a_src, files)
        a_ckpt = os.path.join(work, "a_ckpt")
        chain = ann_assimilate_stream(spark, a_src, a_base, a_out,
                                      rounder=r6, k=3, nprobe=8,
                                      checkpoint_dir=a_ckpt)
        res = read_bridge_output(spark, a_out, ANN_RESULT_SCHEMA)
        d2_hits_d1 = res.filter(
            "day = 2 AND n_id % 20 = 2"   # a day-1 vector as neighbor
        ).count()
        print(f"VECTORS {len(chain)} generations; "
              f"{d2_hits_d1} day-2 neighbor rows point at day-1 vectors")

        # ------------------------------------- 4. LIFETIME MANAGEMENT
        # The operational tail the daily job runs on its own cadence:
        # compact the chain (one file per inverted list), REBASE the
        # bridge manifest onto the compacted head so the live job
        # adopts it, then GC — the chain-aware sweep spares everything
        # a manifest still references, and the generations the rebase
        # released age out on the normal clock.
        from mycenae_spark.streaming.assimilate import (
            prune_bridge_output,
            rebase_bridge_chain,
        )

        compacted = pq.compact_ivfpq_index(spark, chain[-1])
        st = rebase_bridge_chain(a_out, compacted, expect_head=chain[-1])
        print(f"compacted chain -> {os.path.basename(compacted)} "
              "(one file per inverted list); manifest rebased, days "
              f"{st['horizon_days']} moved past the replay horizon")

        # day 3 continues ON the rebased chain (pass the new base)
        d3 = (e.filter((F.col("vec_id") % 20 == 4) & (F.col("vec_id") < 200))
              .select("vec_id", "embedding").collect())
        write_day_files(a_src, files + [("day3.jsonl", [
            json.dumps({"vec_id": 100000 + r["vec_id"], "day": 3,
                        "embedding": list(r["embedding"])}) for r in d3
        ])])
        chain2 = ann_assimilate_stream(spark, a_src, compacted, a_out,
                                       rounder=r6, k=3, nprobe=8,
                                       checkpoint_dir=a_ckpt)
        swept = pq.gc_pq_indexes(max_age_s=0)  # demo clock: sweep now
        print(f"rebased bridge ran day 3 ({len(chain2)} generations on "
              f"the compacted base); GC swept {len(swept)} released "
              "dirs, spared every manifest-referenced generation")
        ret = prune_bridge_output(a_out, keep_last=2)
        print(f"result-lake retention pruned days {ret['pruned']}, "
              f"kept {ret['kept']}")

        # the chain-lifetime dial an operator polls instead of reading
        # _chain.json by hand (same state served over HTTP as
        # GET /keysets/{ks}/api/query/chain_status with chain_dir=a_out)
        from mycenae_spark.server import Engine

        cs = Engine(spark, os.path.join(work, "_lk"),
                    os.path.join(work, "_ct"),
                    chain_dir=a_out).query_chain_status()
        print(f"chain status: {cs['n_generations']} generations, head "
              f"{'on disk' if cs['head_on_disk'] else 'MISSING'}, "
              f"horizon days {cs['horizon_days']}, pruned "
              f"{cs['pruned_days']}, manifest {cs['manifest_md5'][:8]}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
