SELECT
  priority_rank,
  o_orderstatus,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
  MIN(order_date) AS first_order_date,
  MAX(order_date) AS last_order_date
FROM `{{ ref('analytics.orders_enriched') }}`
GROUP BY priority_rank, o_orderstatus
