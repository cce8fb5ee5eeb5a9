package graft

/** DuckDB oracle SQL for tier B (operators/Olap.scala). */
object OraclesB {

  val sql: Map[String, String] = Map(
    "b21_time_window" -> """
      select event_id, user_id, epoch_us(ts) as ts_us,
             count(*) over (partition by user_id order by epoch_us(ts)
               range between 600000000 preceding and current row) as n_10m,
             round(sum(value) over (partition by user_id order by epoch_us(ts)
               range between 600000000 preceding and current row), 4) as v_10m
      from events order by event_id
    """,

    "b1_pricing_summary" -> """
      select l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) as sum_qty,
             round(sum(l_extendedprice), 2) as sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) as sum_charge,
             round(avg(l_quantity), 4) as avg_qty,
             round(avg(l_extendedprice), 4) as avg_price,
             round(avg(l_discount), 4) as avg_disc,
             count(*) as count_order
      from lineitem
      where l_shipdate <= timestamp '1998-09-02'
      group by l_returnflag, l_linestatus
      order by l_returnflag, l_linestatus
    """,

    "b2_top_revenue" -> """
      select l_orderkey, o_orderdate::date as o_orderdate, o_orderpriority,
             round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
      from lineitem
      join orders on l_orderkey = o_orderkey
      join customer on o_custkey = c_custkey
      where c_mktsegment = 'BUILDING'
        and o_orderdate < timestamp '1998-01-01'
        and l_shipdate > timestamp '1998-01-01'
      group by l_orderkey, o_orderdate::date, o_orderpriority
      order by revenue desc, l_orderkey
      limit 10
    """,

    "b3_region_revenue" -> """
      select r_name, n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
      from lineitem
      join orders on l_orderkey = o_orderkey
      join customer on o_custkey = c_custkey
      join nation on c_nationkey = n_nationkey
      join region on n_regionkey = r_regionkey
      group by r_name, n_name
      order by revenue desc, r_name, n_name
    """,

    "b4_window_topn" -> """
      with rev as (
        select p_brand, p_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
        from lineitem join part on l_partkey = p_partkey
        group by p_brand, p_partkey),
      ranked as (
        select p_brand, p_partkey, revenue,
               row_number() over (partition by p_brand order by revenue desc, p_partkey)::bigint as rank
        from rev)
      select p_brand, p_partkey, revenue, rank from ranked
      where rank <= 3 order by p_brand, rank
    """,

    "b5_rollup" -> """
      select coalesce(r_name, 'ALL') as region,
             coalesce(n_name, 'ALL') as nation,
             count(*) as n_customers,
             round(sum(c_acctbal), 2) as acctbal
      from customer
      join nation on c_nationkey = n_nationkey
      join region on n_regionkey = r_regionkey
      group by rollup(r_name, n_name)
      order by region, nation
    """,

    "b6_semi_anti" -> """
      with w as (
        select o_orderpriority, count(*) as n_with_lineitems
        from orders o
        where exists (select 1 from lineitem l where l.l_orderkey = o.o_orderkey)
        group by o_orderpriority),
      wo as (
        select o_orderpriority, count(*) as n_without_lineitems
        from orders o
        where not exists (select 1 from lineitem l where l.l_orderkey = o.o_orderkey)
        group by o_orderpriority)
      select coalesce(w.o_orderpriority, wo.o_orderpriority) as o_orderpriority,
             coalesce(n_with_lineitems, 0) as n_with_lineitems,
             coalesce(n_without_lineitems, 0) as n_without_lineitems
      from w full outer join wo on w.o_orderpriority = wo.o_orderpriority
      order by o_orderpriority
    """,

    "b7_pivot" -> """
      select user_id,
             sum(case when event_type = 'click' then 1 else 0 end)::bigint as click,
             sum(case when event_type = 'view' then 1 else 0 end)::bigint as view,
             sum(case when event_type = 'purchase' then 1 else 0 end)::bigint as purchase,
             sum(case when event_type = 'signup' then 1 else 0 end)::bigint as signup,
             sum(case when event_type = 'error' then 1 else 0 end)::bigint as error
      from events group by user_id order by user_id
    """,

    "b8_asof_attr" -> """
      with ev as (
        select event_id, user_id, event_type, epoch_us(ts) as ts_us from events),
      attr as (
        select event_id, user_id, event_type, ts_us,
               max(case when event_type = 'click' then ts_us end) over (
                 partition by user_id order by ts_us, event_id
                 rows between unbounded preceding and 1 preceding) as last_click_ts_us
        from ev)
      select event_id, user_id, ts_us, last_click_ts_us,
             ts_us - last_click_ts_us as gap_us
      from attr where event_type = 'purchase' order by event_id
    """,

    "b10_salted_agg" -> """
      select user_id, count(*) as n_events, round(sum(value), 4) as sum_value
      from events group by user_id order by user_id
    """,

    "b11_quantiles" -> """
      select event_type, count(*) as n,
             round(quantile_cont(value, 0.25), 4) as p25,
             round(quantile_cont(value, 0.5), 4) as p50,
             round(quantile_cont(value, 0.75), 4) as p75,
             round(quantile_cont(value, 0.95), 4) as p95,
             round(stddev_samp(value), 4) as sd,
             round(min(value), 4) as vmin,
             round(max(value), 4) as vmax
      from events group by event_type order by event_type
    """,

    "b12_moving_agg" -> """
      with ev as (
        select event_id, user_id, epoch_us(ts) as ts_us, value from events)
      select event_id, user_id, ts_us, value,
             round(sum(value) over (partition by user_id order by ts_us, event_id
               rows between unbounded preceding and current row), 4) as running_sum,
             round(avg(value) over (partition by user_id order by ts_us, event_id
               rows between 4 preceding and current row), 4) as moving_avg5,
             row_number() over (partition by user_id order by ts_us, event_id)::bigint as seq
      from ev order by event_id
    """,

    "b14_cube" -> """
      select coalesce(r_name, 'ALL') as region,
             coalesce(o_orderpriority, 'ALL') as priority,
             grouping(r_name, o_orderpriority)::bigint as gid,
             count(*) as n_orders,
             round(sum(o_totalprice), 2) as total_price
      from orders
      join customer on o_custkey = c_custkey
      join nation on c_nationkey = n_nationkey
      join region on n_regionkey = r_regionkey
      group by cube(r_name, o_orderpriority)
      order by gid, region, priority
    """,

    "b15_setops" -> """
      with c97 as (select distinct o_custkey from orders where year(o_orderdate) = 1997),
      c98 as (select distinct o_custkey from orders where year(o_orderdate) = 1998),
      both_y as (select o_custkey from c97 intersect select o_custkey from c98),
      o97 as (select o_custkey from c97 except select o_custkey from c98),
      o98 as (select o_custkey from c98 except select o_custkey from c97)
      select 'both_years' as cohort, count(*) as n_custs,
             min(o_custkey) as min_cust, max(o_custkey) as max_cust from both_y
      union all
      select 'only_1997', count(*), min(o_custkey), max(o_custkey) from o97
      union all
      select 'only_1998', count(*), min(o_custkey), max(o_custkey) from o98
      order by cohort
    """,

    "b16_gapfill" -> """
      with ev as (
        select date_trunc('hour', ts) as hour, event_type, value from events),
      counts as (
        select hour, event_type, count(*) as n_events,
               round(sum(value), 4) as sum_value
        from ev group by 1, 2),
      bounds as (select min(hour) as h0, max(hour) as h1 from ev),
      hours as (select unnest(generate_series(h0, h1, interval 1 hour)) as hour from bounds),
      types as (select distinct event_type from ev)
      select epoch_us(hours.hour) as hour_us, types.event_type as event_type,
             coalesce(counts.n_events, 0) as n_events,
             coalesce(counts.sum_value, 0.0) as sum_value
      from hours cross join types
      left join counts on counts.hour = hours.hour and counts.event_type = types.event_type
      order by hour_us, event_type
    """,

    "b17_unpivot" -> """
      with u as (select distinct user_id from events),
      t as (select unnest(['click','error','purchase','signup','view']) as event_type),
      c as (select user_id, event_type, count(*) as n from events group by 1, 2)
      select u.user_id as user_id, t.event_type as event_type, coalesce(c.n, 0)::bigint as n
      from u cross join t
      left join c on c.user_id = u.user_id and c.event_type = t.event_type
      order by u.user_id, t.event_type
    """,

    "b18_listagg" -> """
      select user_id,
             array_to_string(list_sort(list_distinct(list(event_type))), ',') as types_csv,
             count(*) as n_events
      from events group by user_id order by user_id
    """,

    "b19_window_nav" -> """
      with ev as (
        select event_id, user_id, event_type, epoch_us(ts) as ts_us from events)
      select event_id, user_id, ts_us,
             first_value(event_type) over wf as first_type,
             last_value(event_type) over wf as last_type,
             lead(ts_us, 1) over w - ts_us as us_to_next,
             ntile(4) over w::bigint as quartile,
             round(percent_rank() over w, 4) as pct_rank,
             round(cume_dist() over w, 4) as cume
      from ev
      window w as (partition by user_id order by ts_us, event_id),
             wf as (partition by user_id order by ts_us, event_id
                    rows between unbounded preceding and unbounded following)
      order by event_id
    """,

    "b20_bivariate" -> s"""
      select event_type, count(*) as n,
             ${Rz("corr(t, value)", 4)} as corr_tv,
             ${Rz("covar_samp(t, value)", 4)} as covar_s,
             ${Rz("covar_pop(t, value)", 4)} as covar_p,
             ${Rz("regr_slope(value, t)", 4)} as slope,
             ${Rz("regr_intercept(value, t)", 4)} as intercept
      from (select event_type, value, epoch_us(ts)::double / 1e12 as t from events)
      group by event_type order by event_type
    """,

    // the hot-bin cap is part of the operator's semantics (burst
    // seconds are dropped via the pair's LATER row), so the oracle
    // enforces the same cap — literal interpolated from the operator
    "b13_range_join" -> s"""
      with ev as (
        select event_id, user_id, epoch_us(ts) as ts_us,
               count(*) over (partition by ts_us // 1000000)
                 <= ${graft.operators.Olap.RangeBinCap} as under_cap
        from events)
      select a.event_id as id_a, b.event_id as id_b, b.ts_us - a.ts_us as dt_us
      from ev a join ev b
        on a.event_id < b.event_id
       and a.user_id <> b.user_id
       and abs(a.ts_us - b.ts_us) <= 1000000
       and (case when b.ts_us >= a.ts_us then b.under_cap else a.under_cap end)
      order by id_a, id_b
    """,

    "b22_grouping_sets" -> """
      select coalesce(l_returnflag, 'ALL') as returnflag,
             coalesce(l_linestatus, 'ALL') as linestatus,
             coalesce(sy, -1)::bigint as ship_year,
             grouping(l_returnflag, l_linestatus, sy)::bigint as gid,
             count(*) as n_rows,
             round(sum(l_extendedprice), 2) as total_price
      from (select *, year(l_shipdate)::bigint as sy from lineitem)
      group by grouping sets ((l_returnflag, l_linestatus), (sy), ())
      order by gid, returnflag, linestatus, ship_year
    """,

    "b9_sessionize" -> """
      with ev as (
        select event_id, user_id, epoch_us(ts) as ts_us from events),
      g as (
        select event_id, user_id, ts_us,
               case when lag(ts_us) over w is null
                      or ts_us - lag(ts_us) over w > 1800000000
                    then 1::bigint else 0::bigint end as new_session
        from ev window w as (partition by user_id order by ts_us, event_id)),
      s as (
        select event_id, user_id, ts_us,
               sum(new_session) over (partition by user_id order by ts_us, event_id
                 rows between unbounded preceding and current row)::bigint as session_seq
        from g)
      select event_id, user_id, ts_us, session_seq from s order by event_id
    """
  )
}
