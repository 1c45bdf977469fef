"""Path analysis: pandas twin parity for the transition matrix and top
opening paths, tie determinism via seq_col, end-token semantics, and
partition invariance on the real NTZ events table."""

from __future__ import annotations

import pandas as pd
import pytest

from modlyn_spark.operators.paths import top_paths, transition_counts

SF = "/root/testdata/sf0.001"


def _pdf():
    rows = []
    seq = 0
    for u in range(12):
        for j in range(1 + (u * 3) % 6):
            rows.append(
                {
                    "u": f"u{u}",
                    "ts": float(j),
                    "ev": ["view", "click", "buy"][(u + j) % 3],
                    "seq": seq,
                }
            )
            seq += 1
    # a timestamp tie inside one entity: seq must break it
    rows.append({"u": "u0", "ts": 0.0, "ev": "tie", "seq": 9999})
    return pd.DataFrame(rows)


def _twin_transitions(pdf, end="__END__"):
    d = pdf.sort_values(["u", "ts", "seq"])
    d["nxt"] = d.groupby("u")["ev"].shift(-1)
    if end is None:
        d = d[d["nxt"].notna()]
    else:
        d["nxt"] = d["nxt"].fillna(end)
    out = (
        d.groupby(["ev", "nxt"]).size().rename("n").reset_index()
    )
    tot = out.groupby("ev")["n"].transform("sum")
    out["p"] = out["n"] / tot
    return out.sort_values(["ev", "nxt"]).reset_index(drop=True)


def test_transition_twin_parity(spark):
    pdf = _pdf()
    got = (
        transition_counts(spark.createDataFrame(pdf), "u", "ts", "ev",
                          seq_col="seq")
        .toPandas()
        .sort_values(["event", "next_event"])
        .reset_index(drop=True)
    )
    exp = _twin_transitions(pdf)
    assert list(got["event"]) == list(exp["ev"])
    assert list(got["next_event"]) == list(exp["nxt"])
    assert list(got["n"]) == list(exp["n"])
    pd.testing.assert_series_equal(
        got["p"], exp["p"], check_names=False, rtol=1e-12
    )


def test_end_token_none_drops_terminals(spark):
    pdf = _pdf()
    df = spark.createDataFrame(pdf)
    kept = transition_counts(df, "u", "ts", "ev", seq_col="seq",
                             end_token=None).toPandas()
    assert not (kept["next_event"] == "__END__").any()
    exp = _twin_transitions(pdf, end=None)
    assert kept["n"].sum() == exp["n"].sum()


def test_probabilities_sum_to_one_per_source(spark):
    got = transition_counts(
        spark.createDataFrame(_pdf()), "u", "ts", "ev", seq_col="seq"
    ).toPandas()
    sums = got.groupby("event")["p"].sum()
    assert ((sums - 1.0).abs() < 1e-9).all()


def test_top_paths_twin(spark):
    pdf = _pdf()
    got = (
        top_paths(spark.createDataFrame(pdf), "u", "ts", "ev",
                  depth=3, seq_col="seq")
        .toPandas()
        .sort_values("path")
        .reset_index(drop=True)
    )
    d = pdf.sort_values(["u", "ts", "seq"]).groupby("u").head(3)
    exp = (
        d.groupby("u")["ev"]
        .apply(lambda s: ">".join(s))
        .rename("path")
        .reset_index()
        .groupby("path")
        .size()
        .rename("n_entities")
        .reset_index()
        .sort_values("path")
        .reset_index(drop=True)
    )
    assert list(got["path"]) == list(exp["path"])
    assert list(got["n_entities"]) == list(exp["n_entities"])
    assert (
        got["path_len"]
        == got["path"].str.count(">") + 1
    ).all()


def test_partition_invariance_on_real_events(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    a = (
        transition_counts(ev.repartition(1), "user_id", "ts", "event_type",
                          seq_col="event_id")
        .toPandas()
        .sort_values(["event", "next_event"])
        .reset_index(drop=True)
    )
    b = (
        transition_counts(ev.repartition(9), "user_id", "ts", "event_type",
                          seq_col="event_id")
        .toPandas()
        .sort_values(["event", "next_event"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 5


def test_validation(spark):
    df = spark.createDataFrame(_pdf())
    with pytest.raises(ValueError, match="depth"):
        top_paths(df, "u", "ts", "ev", depth=0)
