"""SFT chat-turn construction, loss masking, truncation, curriculum."""

from pyspark.sql import functions as F

from hnormalise_spark.ops import chatops as C


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _words(n):
    return " ".join(f"w{i}" for i in range(n))


def test_chat_turns_structure(spark):
    df = _docs(spark, [_words(20)]).select(
        C.chat_turns(F.col("text"), 8).alias("turns")
    )
    [row] = df.collect()
    turns = row.turns
    assert [t.turn_idx for t in turns] == [0, 1, 2]
    assert [t.role for t in turns] == ["user", "assistant", "user"]
    assert [len(t.toks) for t in turns] == [8, 8, 4]
    assert turns[0].toks[0] == "w0" and turns[2].toks[-1] == "w19"


def test_sft_mask_stats_partial_last_assistant(spark):
    # 12 tokens -> turns [8 user, 4 assistant]; ctx 50 keeps all
    out = C.sft_mask_stats(_docs(spark, [_words(12)])).collect()[0]
    assert (out.n_tok, out.n_turns) == (12, 2)
    assert (out.n_user_tok, out.n_asst_tok) == (8, 4)
    assert out.loss_ppm == round(4 / 12 * 1e6)
    assert (out.kept_turns, out.kept_tokens, out.trunc_tokens) == (2, 12, 0)


def test_sft_mask_truncation_latch(spark):
    # 58 tokens -> 8 turns (7x8 + 2). Budget 50 keeps 6 full turns
    # (48 tok); turn 6 (8 tok) does not fit, so the window CLOSES and
    # the 2-token final turn must NOT sneak in despite fitting.
    out = C.sft_mask_stats(_docs(spark, [_words(58)])).collect()[0]
    assert out.n_turns == 8
    assert (out.kept_turns, out.kept_tokens) == (6, 48)
    assert out.trunc_tokens == 10


def test_sft_mask_empty_and_whitespace(spark):
    rows = {
        r.doc_id: r for r in C.sft_mask_stats(_docs(spark, ["", "   "])).collect()
    }
    for r in rows.values():
        assert (r.n_tok, r.n_turns, r.kept_turns, r.trunc_tokens) == (0, 0, 0, 0)
        assert r.loss_ppm == 0


def test_sft_mask_exact_window_boundary(spark):
    # 50 tokens -> 7 turns (6x8 + 2); last turn exactly fills budget.
    out = C.sft_mask_stats(_docs(spark, [_words(50)])).collect()[0]
    assert (out.kept_turns, out.kept_tokens, out.trunc_tokens) == (7, 50, 0)


def test_curriculum_schedule_invariants(spark):
    texts = [_words(5 + i) + (" zz!!" * (i % 4)) for i in range(40)]
    out = C.curriculum_schedule(_docs(spark, texts), n_stages=4)
    rows = out.collect()
    assert len(rows) == 40
    stages = {r.stage for r in rows}
    assert stages <= {0, 1, 2, 3} and len(stages) >= 2
    # rank is 1..k dense per stage; cum_tokens is the running sum in
    # rank order; stage assignment is monotone in quality
    by_stage = {}
    for r in rows:
        by_stage.setdefault(r.stage, []).append(r)
    for st, rs in by_stage.items():
        rs.sort(key=lambda r: r.rank_in_stage)
        assert [r.rank_in_stage for r in rs] == list(range(1, len(rs) + 1))
        run = 0
        for r in rs:
            run += r.n_tok
            assert r.cum_tokens == run
    maxq = {st: max(r.quality_x1e4 for r in rs) for st, rs in by_stage.items()}
    minq = {st: min(r.quality_x1e4 for r in rs) for st, rs in by_stage.items()}
    for st in sorted(by_stage):
        for hi in sorted(by_stage):
            if hi > st:
                assert maxq[st] <= minq[hi]


def test_curriculum_deterministic_across_partitionings(spark):
    texts = [_words(6 + i % 9) for i in range(30)]
    df = _docs(spark, texts)
    a = C.curriculum_schedule(df.repartition(1)).collect()
    b = C.curriculum_schedule(df.repartition(13)).collect()
    key = lambda r: r.doc_id  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_render_chat_bytes(spark):
    out = _docs(spark, [_words(12)]).select(
        C.render_chat(F.col("text"), 8).alias("r")
    ).collect()[0].r
    assert out == "<|user|> w0 w1 w2 w3 w4 w5 w6 w7<|assistant|> w8 w9 w10 w11"


def test_render_chat_empty(spark):
    out = C.rendered_conversations(_docs(spark, [""])).collect()[0]
    assert out.rendered == "" and out.n_rendered_chars == 0


def test_sft_pipeline_invariants(spark):
    from hnormalise_spark.ops.entry import q_sft_pipeline

    rows = q_sft_pipeline(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.n_kept <= r.n_gated <= r.n_in
        assert r.sum_kept_tok + r.sum_trunc_tok == r.sum_tok
        assert 0 <= r.loss_ppm <= 1_000_000
        assert r.n_batches >= (1 if r.sum_kept_tok > 0 else 0)


def _py_sft(n_tok, turn_tokens=8, max_ctx=50):
    """Independent pure-Python greedy simulation of sft_mask_stats."""
    sizes = []
    left = n_tok
    while left > 0:
        take = min(turn_tokens, left)
        sizes.append(take)
        left -= take
    n_user = sum(s for i, s in enumerate(sizes) if i % 2 == 0)
    kept_turns = kept_tok = 0
    open_win = True
    for s in sizes:
        if open_win and kept_tok + s <= max_ctx:
            kept_turns += 1
            kept_tok += s
        else:
            open_win = False
    return {
        "n_tok": n_tok,
        "n_turns": len(sizes),
        "n_user_tok": n_user,
        "n_asst_tok": n_tok - n_user,
        "loss_ppm": int((n_tok - n_user) / n_tok * 1e6 + 0.5) if n_tok else 0,
        "kept_turns": kept_turns,
        "kept_tokens": kept_tok,
        "trunc_tokens": n_tok - kept_tok,
    }


def test_sft_mask_exhaustive_0_to_120(spark):
    # every turn-count shape around the window boundaries, one job
    texts = [(n, _words(n)) for n in range(0, 121)]
    df = spark.createDataFrame(
        [(n, t) for n, t in texts], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in C.sft_mask_stats(df).collect()}
    assert len(got) == 121
    for n in range(0, 121):
        exp = _py_sft(n)
        r = got[n]
        for k, v in exp.items():
            assert getattr(r, k) == v, (n, k, getattr(r, k), v)
