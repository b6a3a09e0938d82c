"""Configuration and profile system."""
