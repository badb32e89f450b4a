"""Raw-web extraction throughput probe: MB/s through the boilerpipe
mapInPandas pass, and rows/s through the codegen URL/line paths.

html_extract is the newest Python-heavy stage (the only one besides
the media codecs); this probe puts a measured number on it so the
100 TB sizing is arithmetic, not a vibe. The stdlib html.parser sets
the FLOOR — a deployment can swap a C parser (lxml/selectolax) into
the same mapInPandas slot (identical schema/batching) and only this
stage speeds up. The codegen contrast rows (canonicalize_url,
line_quality_filter) quantify why those stages must NEVER be UDFs.

Usage: python tools/webtext_probe.py [n_pages] [paras_per_page]
Prints one JSON line; human summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.operators import webtext as W
from qb_data_pipeline_backfill_spark.session import get_spark

_WORDS = (
    "key agg row scan slow fast table value part hash merge batch "
    "window spark order data column join small line customer query"
).split()


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    paras = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

    spark = get_spark("webtext-probe", extra_conf={"spark.driver.memory": "8g"})

    # realistic pages: ~paras paragraphs of ~60 words each plus the
    # usual chrome (nav, aside link farm, footer) — ~5-6 KB of markup
    # per page at the defaults; synthesized executor-side and
    # persisted so the probe times EXTRACTION, not synthesis.
    def synth(batches):
        for pdf in batches:
            rows = []
            for pid in pdf["id"]:
                pid = int(pid)
                body = []
                for p in range(paras):
                    ws = " ".join(
                        _WORDS[(pid + p + i) % len(_WORDS)] for i in range(60)
                    )
                    body.append(f"<p>{ws} &amp; more</p>")
                html = (
                    f"<html><head><title>Page {pid}</title>"
                    "<style>p{margin:0}</style><script>var x=1<2;</script>"
                    '</head><body><nav><a href="/">Home</a> '
                    '<a href="/a">A</a> <a href="/b">B</a></nav>'
                    f'<div class="c">{"".join(body)}</div>'
                    '<aside><a href="/x">rel</a> <a href="/y">ated</a></aside>'
                    "<footer>&copy; corp</footer></body></html>"
                )
                rows.append({"doc_id": pid, "html": html})
            yield pd.DataFrame(rows, columns=["doc_id", "html"])

    pages = (
        spark.range(n_pages)
        .repartition(32)
        .mapInPandas(synth, "doc_id long, html string")
        .persist()
    )
    total_mb = (
        pages.select(F.sum(F.length("html")).alias("b")).collect()[0]["b"]
        / 1e6
    )

    def best(fn):
        t = min_t = None
        for _ in range(passes):
            t0 = time.monotonic()
            fn()
            t = time.monotonic() - t0
            min_t = t if min_t is None else min(min_t, t)
        return min_t

    extract_sec = best(
        lambda: W.html_extract(pages, "html")
        .select(F.sum(F.length("text")))
        .collect()
    )
    urls = pages.select(
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW.Example.COM:80/p/"),
            F.col("doc_id").cast("string"),
            F.lit("?utm_source=x&id=1#f"),
        ).alias("url"),
    ).persist()
    urls.count()
    canon_sec = best(
        lambda: urls.select(
            F.sum(F.length(W.canonicalize_url("url")))
        ).collect()
    )
    lines = W.html_extract(pages, "html").select("doc_id", "text").persist()
    lines.count()
    linefilter_sec = best(
        lambda: W.line_quality_filter(lines, "text")
        .select(F.sum("n_kept"))
        .collect()
    )

    out = {
        "n_pages": n_pages,
        "markup_mb": round(total_mb, 2),
        "extract_sec": round(extract_sec, 3),
        "extract_mb_per_s": round(total_mb / extract_sec, 2),
        "extract_pages_per_s": round(n_pages / extract_sec, 1),
        "url_canon_sec": round(canon_sec, 3),
        "url_canon_rows_per_s": round(n_pages / canon_sec, 1),
        "line_filter_sec": round(linefilter_sec, 3),
        "line_filter_rows_per_s": round(n_pages / linefilter_sec, 1),
        "passes": passes,
        "cpus": spark.sparkContext.defaultParallelism,
    }
    print(
        f"extract {out['extract_mb_per_s']} MB/s "
        f"({out['extract_pages_per_s']} pages/s); "
        f"canon {out['url_canon_rows_per_s']:.0f} rows/s; "
        f"line-filter {out['line_filter_rows_per_s']:.0f} rows/s",
        file=sys.stderr,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
