"""Typed Kafka security configuration (SSL / SASL).

Parity surface: the reference app constructor takes ~20 flat security
kwargs (kaflow/applications.py:91-186 — ``security_protocol``,
``cafile``/``capath``/``cadata``, ``certfile``/``keyfile``/
``cert_password``, ``sasl_mechanism``, ``sasl_plain_username``/
``sasl_plain_password``, ``sasl_kerberos_*``) and feeds them to
aiokafka's ``create_ssl_context``. On Spark the equivalent is the
Kafka *Java* client configured through ``kafka.``-prefixed source/sink
options, so this module translates the same typed kwargs into that
option map — PEM-style (the Java client accepts PEM trust/key material
natively since Kafka 2.7, no JKS conversion needed) and JAAS for
SASL PLAIN/SCRAM.

Everything here is declarative option-mapping: no file IO, no network,
fully unit-testable without a broker.
"""

from __future__ import annotations

from dataclasses import dataclass

SECURITY_PROTOCOLS = ("PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL")
SASL_MECHANISMS = ("PLAIN", "GSSAPI", "OAUTHBEARER", "SCRAM-SHA-256", "SCRAM-SHA-512")

_JAAS_MODULES = {
    "PLAIN": "org.apache.kafka.common.security.plain.PlainLoginModule",
    "SCRAM-SHA-256": "org.apache.kafka.common.security.scram.ScramLoginModule",
    "SCRAM-SHA-512": "org.apache.kafka.common.security.scram.ScramLoginModule",
}


def _jaas_escape(s: str) -> str:
    """Escape a JAAS double-quoted string value."""
    return s.replace("\\", "\\\\").replace('"', '\\"')


@dataclass
class KafkaSecurity:
    """Typed SSL/SASL settings → ``kafka.*`` option map.

    Field names mirror the reference constructor kwargs
    (kaflow/applications.py:91-186) so a reference user's config moves
    over 1:1; :meth:`options` emits the Java-client equivalents.
    """

    security_protocol: str = "PLAINTEXT"
    # --- TLS trust material (server verification) ---
    cafile: str | None = None  # path to CA bundle (PEM)
    cadata: str | None = None  # inline CA certs (PEM text)
    capath: str | None = None  # unsupported on the Java client; see options()
    # --- TLS client identity (mutual TLS) ---
    certfile: str | None = None  # PEM with client cert chain AND private key
    keyfile: str | None = None  # only if == certfile (Java PEM is one file)
    cert_password: str | None = None
    # --- SASL ---
    sasl_mechanism: str | None = None
    sasl_plain_username: str | None = None
    sasl_plain_password: str | None = None
    sasl_kerberos_service_name: str = "kafka"
    sasl_kerberos_domain_name: str | None = None  # aiokafka-only; no Java knob

    def __post_init__(self) -> None:
        if self.security_protocol not in SECURITY_PROTOCOLS:
            raise ValueError(
                f"security_protocol must be one of {SECURITY_PROTOCOLS}, "
                f"got {self.security_protocol!r}"
            )
        sasl = self.security_protocol.startswith("SASL_")
        if sasl and self.sasl_mechanism is None:
            raise ValueError(
                f"{self.security_protocol} requires sasl_mechanism "
                f"(one of {SASL_MECHANISMS})"
            )
        if self.sasl_mechanism is not None:
            if self.sasl_mechanism not in SASL_MECHANISMS:
                raise ValueError(
                    f"sasl_mechanism must be one of {SASL_MECHANISMS}, "
                    f"got {self.sasl_mechanism!r}"
                )
            if not sasl:
                raise ValueError(
                    "sasl_mechanism is set but security_protocol is "
                    f"{self.security_protocol!r}; use SASL_PLAINTEXT or SASL_SSL"
                )
            if self.sasl_mechanism in _JAAS_MODULES and not (
                self.sasl_plain_username and self.sasl_plain_password
            ):
                raise ValueError(
                    f"{self.sasl_mechanism} requires sasl_plain_username "
                    "and sasl_plain_password"
                )
        if self.capath is not None:
            # aiokafka hands capath to OpenSSL's directory lookup; the
            # Java client has no CA-directory option — fail loudly
            # rather than silently not verifying the chain.
            raise ValueError(
                "capath (CA directory) has no Kafka-Java-client "
                "equivalent; concatenate the CAs into one PEM bundle "
                "and pass it as cafile (ssl.truststore.location)"
            )
        if self.cafile is not None and self.cadata is not None:
            raise ValueError("pass either cafile or cadata, not both")
        if (
            self.keyfile is not None
            and self.certfile is not None
            and self.keyfile != self.certfile
        ):
            # The Java client's PEM keystore is ONE file/blob holding
            # the key and the chain (ssl.keystore.location with
            # ssl.keystore.type=PEM); a split cert/key pair can't be
            # joined here without file IO at config time.
            raise ValueError(
                "the Kafka Java client reads a PEM keystore from a "
                "single file containing the private key and the cert "
                "chain; concatenate keyfile+certfile and pass the "
                "result as certfile (keyfile may be omitted or equal)"
            )
        if self.keyfile is not None and self.certfile is None:
            raise ValueError("keyfile without certfile; pass the PEM as certfile")

    # ------------------------------------------------------------------

    def options(self) -> dict[str, str]:
        """The ``kafka.``-prefixed option map for readStream/writeStream."""
        opts: dict[str, str] = {
            "kafka.security.protocol": self.security_protocol
        }
        if self.security_protocol.endswith("SSL"):
            if self.cafile is not None:
                opts["kafka.ssl.truststore.type"] = "PEM"
                opts["kafka.ssl.truststore.location"] = self.cafile
            elif self.cadata is not None:
                opts["kafka.ssl.truststore.type"] = "PEM"
                opts["kafka.ssl.truststore.certificates"] = self.cadata
            if self.certfile is not None:
                opts["kafka.ssl.keystore.type"] = "PEM"
                opts["kafka.ssl.keystore.location"] = self.certfile
                if self.cert_password is not None:
                    opts["kafka.ssl.key.password"] = self.cert_password
        if self.sasl_mechanism is not None:
            opts["kafka.sasl.mechanism"] = self.sasl_mechanism
            module = _JAAS_MODULES.get(self.sasl_mechanism)
            if module is not None:
                user = _jaas_escape(self.sasl_plain_username or "")
                pw = _jaas_escape(self.sasl_plain_password or "")
                opts["kafka.sasl.jaas.config"] = (
                    f'{module} required username="{user}" password="{pw}";'
                )
            elif self.sasl_mechanism == "GSSAPI":
                opts["kafka.sasl.kerberos.service.name"] = (
                    self.sasl_kerberos_service_name
                )
            # OAUTHBEARER: the token provider is a JVM callback class;
            # pass kafka.sasl.login.callback.handler.class (and its
            # jaas config) through App.kafka_options — a Python
            # callable (the reference's sasl_oauth_token_provider)
            # cannot cross into the Java client.
        return opts
