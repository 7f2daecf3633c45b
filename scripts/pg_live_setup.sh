#!/usr/bin/env bash
# Bootstrap a throwaway PostgreSQL server for the live test legs
# (tests/test_pg_copy.py live tests and, with the JDBC driver jar on the
# Spark classpath, tests/test_jdbc.py::test_jdbc_roundtrip_live_postgres).
#
# PostgreSQL refuses to run as root, so this creates a service user first
# (containers often run as root). Idempotent; safe to re-run.
#
#   sudo bash scripts/pg_live_setup.sh
#   export OSM_PG_TEST_DSN='host=/tmp/pgsock user=pguser dbname=test'
#   python -m pytest tests/test_pg_copy.py -q
#
# With the org.postgresql JDBC jar available, additionally:
#   export OSM_PG_TEST_URL='jdbc:postgresql://127.0.0.1:5432/test?user=pguser'
#   python -m pytest tests/test_jdbc.py -q
set -euo pipefail

PGDATA=${PGDATA:-/tmp/pgdata}
PGSOCK=${PGSOCK:-/tmp/pgsock}
PGUSER_NAME=${PGUSER_NAME:-pguser}

command -v initdb >/dev/null || { echo "postgres not installed"; exit 1; }

id "$PGUSER_NAME" >/dev/null 2>&1 || useradd -m "$PGUSER_NAME"
mkdir -p "$PGDATA" "$PGSOCK"
chown "$PGUSER_NAME" "$PGDATA" "$PGSOCK"

if [ ! -f "$PGDATA/PG_VERSION" ]; then
    su "$PGUSER_NAME" -c "initdb -D $PGDATA -E UTF8 --auth-local=trust --auth-host=trust"
fi

if ! su "$PGUSER_NAME" -c "pg_ctl -D $PGDATA status" >/dev/null 2>&1; then
    su "$PGUSER_NAME" -c "pg_ctl -D $PGDATA -l $PGDATA/log \
        -o '-k $PGSOCK -c listen_addresses=127.0.0.1 -p 5432' start"
fi

psql -h "$PGSOCK" -U "$PGUSER_NAME" -d postgres -tAc \
    "SELECT 1 FROM pg_database WHERE datname='test'" | grep -q 1 ||
    psql -h "$PGSOCK" -U "$PGUSER_NAME" -d postgres -c "CREATE DATABASE test"

# hstore is a contrib extension; the reference schema (pgsnapshot) and the
# parity suite's tags columns need it.
psql -h "$PGSOCK" -U "$PGUSER_NAME" -d test -c \
    "CREATE EXTENSION IF NOT EXISTS hstore" >/dev/null

echo "ready: OSM_PG_TEST_DSN='host=$PGSOCK user=$PGUSER_NAME dbname=test'"
