SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderstatus = :status
  AND o_totalprice >= :min_total
  AND CAST(o_orderdate AS DATE) >= :window_start
  AND CAST(o_orderdate AS DATE) <= :window_end
GROUP BY o_orderpriority
