SELECT
  o_orderkey,
  o_custkey,
  o_orderstatus,
  o_totalprice,
  CAST(o_orderdate AS DATE) AS order_date,
  `{{ ref('PRIORITY_RANK') }}`(o_orderpriority) AS priority_rank
FROM `{{ ref('priority_orders') }}`
