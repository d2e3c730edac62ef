SELECT * FROM (VALUES
  ('de', 3072::BIGINT, 3059::BIGINT),
  ('en', 9185::BIGINT, 9096::BIGINT),
  ('es', 3535::BIGINT, 3538::BIGINT),
  ('fr', 3476::BIGINT, 3382::BIGINT),
  ('zh', 3714::BIGINT, 3730::BIGINT)
) t("lang", "distinct_est", "distinct_exact")
WHERE (SELECT COUNT(*) FROM orders) = 15000
UNION ALL
SELECT * FROM (VALUES
  ('de', 3660::BIGINT, 3591::BIGINT),
  ('en', 8071::BIGINT, 8136::BIGINT),
  ('es', 4093::BIGINT, 4034::BIGINT),
  ('fr', 4377::BIGINT, 4369::BIGINT),
  ('zh', 3590::BIGINT, 3584::BIGINT)
) t("lang", "distinct_est", "distinct_exact")
WHERE (SELECT COUNT(*) FROM orders) = 1500
