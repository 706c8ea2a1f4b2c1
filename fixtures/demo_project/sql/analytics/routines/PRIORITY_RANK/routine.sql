CREATE OR REPLACE TEMPORARY FUNCTION `{{ ref(name) }}`(priority STRING)
RETURNS INT
RETURN CAST(substring(priority, 1, 1) AS INT)
