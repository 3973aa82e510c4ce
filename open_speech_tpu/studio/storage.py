"""Studio persistence: a single shared SQLite connection + schema.

Table layout is kept column-compatible with the reference server
(src/storage.py DDL) so studio databases are portable between the two; the
connection/bootstrap plumbing is this module's own.
"""

from __future__ import annotations

import sqlite3
import threading
from pathlib import Path

from open_speech_tpu.config import settings


class _Store:
    """Lazily-opened process-wide SQLite handle (WAL, FKs, row factory)."""

    def __init__(self) -> None:
        self._guard = threading.Lock()
        self._conn: sqlite3.Connection | None = None

    def connection(self) -> sqlite3.Connection:
        with self._guard:
            if self._conn is None:
                target = Path(settings.os_studio_db_path)
                target.parent.mkdir(parents=True, exist_ok=True)
                conn = sqlite3.connect(str(target), check_same_thread=False)
                conn.row_factory = sqlite3.Row
                for pragma in ("journal_mode=WAL", "foreign_keys=ON"):
                    conn.execute(f"PRAGMA {pragma}")
                self._conn = conn
            return self._conn

    def bootstrap(self) -> None:
        conn = self.connection()
        with self._guard:
            for ddl in _TABLES:
                conn.executescript(ddl)
            conn.commit()

    def close(self) -> None:
        with self._guard:
            if self._conn is not None:
                self._conn.close()
                self._conn = None


_store = _Store()


def get_db() -> sqlite3.Connection:
    return _store.connection()


def init_db() -> None:
    _store.bootstrap()


def reset_db() -> None:
    """Close the shared connection (tests switch DB paths between cases)."""
    _store.close()


# Column-compatible with the reference schema; one statement per table.
_TABLES = (
    """
    create table if not exists profiles (
        id text primary key,
        name text not null unique,
        backend text not null,
        model text,
        voice text not null,
        speed real not null default 1.0,
        format text not null default 'mp3',
        blend text,
        reference_audio_id text,
        effects_json text,
        is_default integer not null default 0,
        created_at text not null,
        updated_at text not null
    );
    """,
    """
    create table if not exists history_entries (
        id text primary key,
        type text not null check(type in ('tts','stt')),
        created_at text not null,
        model text,
        voice text,
        speed real,
        format text,
        text_preview text,
        full_text text,
        input_filename text,
        output_path text,
        output_bytes integer,
        streamed integer not null default 0,
        meta_json text
    );
    create index if not exists idx_history_type_created
        on history_entries(type, created_at desc);
    """,
    """
    create table if not exists conversations (
        id text primary key,
        name text,
        created_at text not null,
        updated_at text not null,
        render_output_path text,
        meta_json text
    );
    """,
    """
    create table if not exists conversation_turns (
        id text primary key,
        conversation_id text not null,
        turn_index integer not null,
        speaker text not null,
        profile_id text,
        text text not null,
        audio_path text,
        duration_ms integer,
        effects_json text,
        created_at text not null,
        foreign key(conversation_id)
            references conversations(id) on delete cascade
    );
    create index if not exists idx_turns_conv
        on conversation_turns(conversation_id, turn_index);
    """,
    """
    create table if not exists compositions (
        id text primary key,
        name text,
        sample_rate integer not null default 24000,
        created_at text not null,
        updated_at text not null,
        render_output_path text,
        tracks_json text,
        meta_json text
    );
    """,
)

# kept for callers/tests that want the full DDL in one string
SCHEMA_SQL = "\n".join(_TABLES)
