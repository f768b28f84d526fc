"""Funnel edge semantics: the driving-table shape must count every
user who completed step 1, even with zero later-step events (the
inner-join formulation silently dropped them — caught in review and
fixed; the testdata is dense enough that oracle parity alone can't
distinguish the two shapes)."""

from searchengine_spark.relational.events import FUNNEL_WINDOW_S, q_events_funnel


def test_signup_only_user_counts_in_top_of_funnel(spark, tmp_path, monkeypatch):
    import pandas as pd

    rows = [
        # user 7: signup only — must count in n_signup, nothing else
        (1, "2024-01-01 10:00:00", 7, "signup", 1.0, "{}"),
        # user 8: signup -> click within window, no purchase
        (2, "2024-01-01 10:05:00", 8, "signup", 1.0, "{}"),
        (3, "2024-01-01 10:10:00", 8, "click", 1.0, "{}"),
        # user 9: full funnel, but the click is OUTSIDE the window ->
        # stops at signup (strict conversion-window semantics)
        (4, "2024-01-01 10:00:00", 9, "signup", 1.0, "{}"),
        (5, "2024-01-03 10:00:00", 9, "click", 1.0, "{}"),
        (6, "2024-01-03 10:05:00", 9, "purchase", 1.0, "{}"),
        # user 10: full funnel inside windows
        (7, "2024-01-01 09:00:00", 10, "signup", 1.0, "{}"),
        (8, "2024-01-01 09:30:00", 10, "click", 1.0, "{}"),
        (9, "2024-01-01 09:45:00", 10, "purchase", 1.0, "{}"),
        # user 11: click/purchase but NO signup -> not in the funnel
        (10, "2024-01-01 09:30:00", 11, "click", 1.0, "{}"),
        (11, "2024-01-01 09:45:00", 11, "purchase", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    sf = tmp_path / "sf"
    sf.mkdir()
    pdf.to_parquet(sf / "events.parquet")
    assert FUNNEL_WINDOW_S == 86400  # the 2024-01-03 click is outside

    (row,) = q_events_funnel(spark, str(sf)).collect()
    assert (row.n_signup, row.n_signup_click, row.n_signup_click_purchase) == (4, 2, 1)
