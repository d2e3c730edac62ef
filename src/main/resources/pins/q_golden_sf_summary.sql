SELECT * FROM (VALUES
  ('San Francisco', 8106::BIGINT, 762::BIGINT, 0::BIGINT),
  ('Unincorporated', 10::BIGINT, 0::BIGINT, 0::BIGINT)
) t("city", "n", "n_geom", "n_suffixed")
WHERE (SELECT COUNT(*) FROM orders) = 15000
UNION ALL
SELECT * FROM (VALUES
  ('San Francisco', 8106::BIGINT, 762::BIGINT, 0::BIGINT),
  ('Unincorporated', 10::BIGINT, 0::BIGINT, 0::BIGINT)
) t("city", "n", "n_geom", "n_suffixed")
WHERE (SELECT COUNT(*) FROM orders) = 1500
