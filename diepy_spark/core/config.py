"""Server-connection config (reference: /root/reference/diepy/core.py:92-109).

INI file with a ``[servers]`` section mapping server name → connection URL
(for the Spark engine: a JDBC URL, e.g. ``jdbc:postgresql://host/``).
Resolution order is faithful to the reference: explicit ``config`` argument →
``./diepy.ini`` → ``~/diepy.ini`` → error. A ``database`` argument is
appended to the URL path exactly like the reference does
(rstrip('/') + '/' + database).
"""

from __future__ import annotations

import configparser
import os


class ConfigError(Exception):
    pass


def resolve_config_path(config: str | None = None) -> str:
    if config:
        return config
    if os.path.exists("diepy.ini"):
        return os.path.abspath("diepy.ini")
    home = os.path.expanduser("~/diepy.ini")
    if os.path.exists(home):
        return os.path.abspath(home)
    raise ConfigError("No configuration file found!")


def connection_url(server: str, database: str | None = None, config: str | None = None) -> str:
    parser = configparser.ConfigParser()
    path = resolve_config_path(config)
    parser.read(path)
    try:
        url = parser.get("servers", server)
    except (configparser.NoSectionError, configparser.NoOptionError) as e:
        raise ConfigError(f"Server '{server}' not found in {path}") from e
    if database:
        url = url.rstrip("/") + "/" + database
    return url
