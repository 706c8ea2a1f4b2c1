SELECT
  o_orderstatus,
  {% for m in metrics %}{{ m.sql() }}{{ ',' if not loop.last }}
  {% endfor %}
FROM `{{ ref('scored_orders') }}`
GROUP BY o_orderstatus
