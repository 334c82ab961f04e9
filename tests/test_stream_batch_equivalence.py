"""T1-T7 — the streaming pipeline must produce the batch answer on the
same input (Structured Streaming's batch-stream unification)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR
from tools.check_oracle import frame_key


def test_streaming_final_state_equals_batch(spark):
    stream_df = entrymod.q_streaming_window_agg(spark, SF_DIR)
    batch_df = entrymod.q_flagship(spark, SF_DIR)
    sc, sk = frame_key(stream_df.columns, stream_df.collect())
    bc, bk = frame_key(batch_df.columns, batch_df.collect())
    assert sc == bc
    assert sk == bk
