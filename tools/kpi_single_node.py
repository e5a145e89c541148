#!/usr/bin/env python3
"""Single-node KPI comparison harness (BASELINE.md round-7 table).

Times the reference's engine (pandas, faithful to its DAG's transform
shape) and DuckDB (the repo's oracle SQL) on a replicated events corpus;
the Spark side of the table runs `SparkEntry.queries` via spark-shell
(see BASELINE.md). Generate the corpus with DuckDB:

  COPY (SELECT e.event_id + r.k * 1000000000 AS event_id, e.ts,
               e.user_id, e.event_type, e.value, e.props
        FROM '/root/testdata/sf0.1/events.parquet' e,
             (SELECT unnest(range(N)) AS k) r)
  TO '<dir>/events.parquet'
  (FORMAT PARQUET, FILE_SIZE_BYTES '32MB', OVERWRITE_OR_IGNORE);
  -- plus: cp /root/testdata/sf0.1/customer.parquet <dir>/

Usage: tools/kpi_single_node.py {pandas|duckdb} <dir>
"""
import sys, time

GENRE_SQL = """WITH enriched AS (
  SELECT e.event_id, e.user_id, e.event_type, e.value,
         CAST(e.ts AS DATE) AS date,
         CAST(EXTRACT(hour FROM e.ts) AS INTEGER) AS hour,
         c.c_name, c.c_mktsegment, c.c_acctbal
  FROM events e
  LEFT JOIN (SELECT c_custkey, c_name, c_mktsegment, c_acctbal
             FROM customer WHERE c_acctbal > 5000) c
    ON e.user_id = c.c_custkey)
, f AS (SELECT * FROM enriched
        WHERE c_mktsegment IS NOT NULL AND date IS NOT NULL),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY date, c_mktsegment
        ORDER BY c_acctbal DESC NULLS LAST, event_type ASC NULLS LAST,
                 event_id ASC) AS rn
      FROM f),
genre_kpis AS (
  SELECT CAST(date AS VARCHAR) AS date, c_mktsegment AS track_genre,
         COUNT(event_id) AS listen_count,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(value) AS avg_duration_ms,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(c_acctbal) AS popularity_index,
         MAX(CASE WHEN rn = 1 THEN event_type END) AS most_popular_track,
         MAX(CASE WHEN rn = 1 THEN CAST(c_acctbal AS DOUBLE) END)
           AS most_popular_track_popularity
  FROM r GROUP BY 1, 2)
SELECT * FROM genre_kpis ORDER BY date, track_genre"""

HOURLY_SQL = """WITH enriched AS (
  SELECT e.event_id, e.user_id, e.event_type, e.value,
         CAST(e.ts AS DATE) AS date,
         CAST(EXTRACT(hour FROM e.ts) AS INTEGER) AS hour,
         c.c_name, c.c_mktsegment, c.c_acctbal
  FROM events e
  LEFT JOIN (SELECT c_custkey, c_name, c_mktsegment, c_acctbal
             FROM customer WHERE c_acctbal > 5000) c
    ON e.user_id = c.c_custkey)
, hf AS (SELECT * FROM enriched WHERE date IS NOT NULL),
agg AS (SELECT date, hour,
          COUNT(DISTINCT user_id) AS unique_listeners,
          COUNT(event_type) AS total_plays,
          COUNT(DISTINCT event_type) AS unique_tracks
        FROM hf GROUP BY 1, 2),
pc AS (SELECT date, hour, c_name, COUNT(event_type) AS play_count
       FROM hf WHERE c_name IS NOT NULL GROUP BY 1, 2, 3),
top AS (SELECT date, hour, c_name AS top_artist FROM
          (SELECT *, ROW_NUMBER() OVER (PARTITION BY date, hour
             ORDER BY play_count DESC, c_name ASC) AS rn FROM pc)
        WHERE rn = 1),
hourly_kpis AS (
  SELECT CAST(a.date AS VARCHAR) AS date, a.hour, a.unique_listeners,
         a.total_plays, a.unique_tracks, t.top_artist,
         CAST(a.unique_tracks AS DOUBLE) / a.total_plays AS diversity
  FROM agg a LEFT JOIN top t ON a.date = t.date AND a.hour = t.hour)
SELECT * FROM hourly_kpis ORDER BY date, hour"""


def run_duckdb(dirpath):
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{dirpath}/events.parquet/*.parquet'")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{dirpath}/customer.parquet'")
    for name, sql in [("genre", GENRE_SQL), ("hourly", HOURLY_SQL)]:
        for p in (1, 2):
            t0 = time.time()
            n = len(con.execute(sql).fetchall())
            print(f"DUCKDB {name} pass{p}: {time.time()-t0:.1f}s rows={n}", flush=True)


def run_pandas(dirpath):
    import pandas as pd, glob
    t0 = time.time()
    ev = pd.concat([pd.read_parquet(f, columns=['event_id','ts','user_id','event_type','value']) for f in
                    sorted(glob.glob(f'{dirpath}/events.parquet/*.parquet'))],
                   ignore_index=True)
    cu = pd.read_parquet(f'{dirpath}/customer.parquet')
    t_read = time.time() - t0
    print(f"PANDAS read: {t_read:.1f}s rows={len(ev)}", flush=True)
    t0 = time.time()
    cu_f = cu[cu.c_acctbal > 5000][['c_custkey', 'c_name', 'c_mktsegment', 'c_acctbal']]
    enr = ev.merge(cu_f, left_on='user_id', right_on='c_custkey', how='left')
    enr['date'] = enr.ts.dt.date
    enr['hour'] = enr.ts.dt.hour
    f = enr[enr.c_mktsegment.notna() & enr.date.notna()]
    g = f.groupby(['date', 'c_mktsegment'])
    genre = g.agg(listen_count=('event_id', 'count'),
                  avg_duration_ms=('value', 'mean'),
                  popularity_index=('c_acctbal', 'mean'))
    # head(1), NOT groupby.agg('first'): 'first' skips NaN per column
    # independently and can stitch track and popularity from DIFFERENT
    # rows; head(1) takes the literal rn=1 row like idxmax / ROW_NUMBER
    top = (f.sort_values(['c_acctbal', 'event_type', 'event_id'],
                         ascending=[False, True, True])
            .groupby(['date', 'c_mktsegment']).head(1)
            .set_index(['date', 'c_mktsegment'])
            [['event_type', 'c_acctbal']]
            .rename(columns={'event_type': 'most_popular_track',
                             'c_acctbal': 'most_popular_track_popularity'}))
    genre = genre.join(top).reset_index()
    hf = enr[enr.date.notna()]
    h = hf.groupby(['date', 'hour'])
    hourly = h.agg(unique_listeners=('user_id', 'nunique'),
                   total_plays=('event_type', 'count'),
                   unique_tracks=('event_type', 'nunique'))
    pc = (hf[hf.c_name.notna()].groupby(['date', 'hour', 'c_name'])
          .size().reset_index(name='play_count'))
    topa = (pc.sort_values(['play_count', 'c_name'], ascending=[False, True])
              .groupby(['date', 'hour']).head(1)
              .set_index(['date', 'hour'])['c_name'].rename('top_artist'))
    hourly = hourly.join(topa).reset_index()
    hourly['diversity'] = hourly.unique_tracks / hourly.total_plays
    t_tx = time.time() - t0
    print(f"PANDAS transform: {t_tx:.1f}s genre={len(genre)} hourly={len(hourly)}", flush=True)
    print(f"PANDAS TOTAL: {t_read + t_tx:.1f}s", flush=True)


if __name__ == "__main__":
    eng, d = sys.argv[1], sys.argv[2]
    (run_duckdb if eng == "duckdb" else run_pandas)(d)
