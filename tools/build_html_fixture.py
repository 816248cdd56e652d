"""Materialize fixtures/pages_html_300.parquet — the DuckDB oracle's
copy of the rich-HTML synthetic pages (synth.synth_rich_pages_pdf).

The `html_extract` CORRECTNESS query recomputes text extraction from
this snapshot's raw bytes on both engines; test_synth pins the
snapshot byte-identical to the live generator so the oracle can't
drift.  Run from the repo root:  python tools/build_html_fixture.py
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedupe_algo_spark.synth import synth_rich_pages_pdf  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "pages_html_300.parquet",
)


def main() -> None:
    pdf = synth_rich_pages_pdf(300)[["url", "html", "text", "lang"]]
    table = pa.Table.from_pydict(
        {
            "url": pa.array(pdf["url"], pa.string()),
            "html": pa.array(pdf["html"], pa.binary()),
            "text": pa.array(pdf["text"], pa.string()),
            "lang": pa.array(pdf["lang"], pa.string()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {len(pdf)} rows -> {OUT}")


if __name__ == "__main__":
    main()
