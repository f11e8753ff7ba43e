from . import engine, queries
